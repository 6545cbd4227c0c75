"""Masked point-query compaction.

The rectangular ``[n_rays, S]``+mask layout wastes field queries on invalid
slots (empty space, truncated budgets).  The reference avoids this with
ragged packed tensors (nerfacc ``pack_info``/CUDA); the TPU-native
equivalent is *static-budget compaction*: gather the valid entries (valid
first, stable order) into a fixed-size buffer of ``K`` slots, run the
expensive function there, and scatter results back, filling untouched slots
with neutral values.

Overflow policy: if more than ``K`` entries are valid, the excess entries
keep their fill values (for SDF queries the fill is "far outside", which
only makes the renderer conservative).  Budgets are chosen so overflow is
rare; callers can log ``n_valid`` to tune them.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def stable_partition_indices(mask: jax.Array) -> jax.Array:
    """Permutation putting True entries first, order preserved (``[M]``).

    Cheaper than ``argsort(~mask)``: two cumsums + one scatter instead of a
    sorting network.
    """
    M = mask.shape[0]
    n_valid = jnp.sum(mask.astype(jnp.int32))
    pos_v = jnp.cumsum(mask.astype(jnp.int32)) - 1
    pos_i = n_valid + jnp.cumsum((~mask).astype(jnp.int32)) - 1
    slot = jnp.where(mask, pos_v, pos_i)
    return jnp.zeros((M,), jnp.int32).at[slot].set(
        jnp.arange(M, dtype=jnp.int32))


stable_partition_rows = jax.vmap(stable_partition_indices)


def compact_indices(mask: jax.Array, budget: int):
    """Indices of up to ``budget`` valid entries (valid-first stable order).

    Returns ``(idx [budget], picked_valid [budget])``.
    """
    idx = stable_partition_indices(mask)[:budget]
    return idx, mask[idx]


def compact_indices_interleaved(mask2d: jax.Array, budget: int):
    """Valid-first indices over a ``[R, S]`` mask in SAMPLE-major order.

    Budget overflow then drops the far samples of *every* ray (whose
    contribution is transmittance-attenuated) instead of every sample of
    the trailing rays — ray-major ordering turns overflow into a spatial
    bias where whole rays at the end of the batch go empty.

    Returns ``(flat ray-major indices [budget], picked [budget])``.
    """
    R, S = mask2d.shape
    idx_sm, picked = compact_indices(mask2d.T.reshape(-1), budget)
    lane = (idx_sm % R) * S + idx_sm // R
    return lane, picked


def compact_apply(
    fn: Callable,
    points: jax.Array,
    mask: jax.Array,
    budget: int,
    fills: Sequence,
    mask2d: jax.Array | None = None,
):
    """Apply ``fn`` to the compacted valid subset of ``points``.

    Args:
      fn: maps ``[K, 3] -> tuple of [K, ...]`` arrays.
      points: ``[M, 3]``.
      mask: ``[M]`` bool.
      budget: static K <= M.
      fills: per-output fill value (scalar or [...]-shaped) for slots that
        are invalid / not evaluated.
      mask2d: optional ``[R, S]`` view of ``mask`` — selects sample-major
        compaction order (graceful overflow, see
        :func:`compact_indices_interleaved`).

    Returns a tuple of ``[M, ...]`` arrays.
    """
    M = points.shape[0]
    if mask2d is not None:
        idx, picked = compact_indices_interleaved(mask2d, budget)
    else:
        idx, picked = compact_indices(mask, budget)
    out = fn(points[idx])
    if not isinstance(out, (tuple, list)):
        out = (out,)
    results = []
    for o, fill in zip(out, fills):
        fill_arr = jnp.broadcast_to(jnp.asarray(fill, o.dtype),
                                    (M, *o.shape[1:]))
        o = jnp.where(
            picked.reshape(-1, *([1] * (o.ndim - 1))), o,
            jnp.broadcast_to(jnp.asarray(fill, o.dtype), o.shape))
        results.append(fill_arr.at[idx].set(o))
    return tuple(results)
