"""Scoped reduced-precision compute policy (the TPU bf16 path).

tiny-cuda-nn runs the reference's encode+MLP in fused fp16
(`models/network_utils.py:58-100` via tinycudann); the TPU-native
equivalent is bfloat16 compute with float32 accumulation on the MXU.
Master parameters stay float32 — a scope only changes the *compute*
dtype of table gathers and matmuls inside it:

    with precision.scope(jnp.bfloat16):
        sdf = geometry.sdf(params, x)        # gathers + matmuls in bf16

``scope(None)`` (or no active scope) keeps everything float32.  The
policy is trace-time Python state: open the scope around the code being
traced (works inside ``jit`` / ``lax.map`` bodies, since those trace
within the ``with`` block).

Primary consumer: the *no-grad* secondary coarse pass of the
physically-based regimes (`render/pbr._indirect_impl`) — it only
*places* fine samples via importance resampling, so half-precision
features there perturb sample positions by O(1e-3) while the fine
shading pass re-queries in float32.  Gathers are HBM-bandwidth-bound on
v5e; halving the row bytes is the point.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

_STACK: list = []


def current_dtype():
    """Active compute dtype, or None for full precision."""
    return _STACK[-1] if _STACK else None


@contextlib.contextmanager
def scope(dtype):
    _STACK.append(jnp.dtype(dtype) if dtype is not None else None)
    try:
        yield
    finally:
        _STACK.pop()


def cast_in(x):
    """Cast an array to the active compute dtype (no-op outside a scope)."""
    d = current_dtype()
    return x if d is None or x.dtype == d else x.astype(d)
