"""Row aggregation (segment-sum) without XLA scatter.

``zeros([S, F]).at[idx].add(vals)`` lowers to a *serialized* scatter-add on
TPU — measured ~12M rows/s on v5e regardless of sortedness or row width.
The hash-table gradients of every encode backward are exactly this
operation at 10^7..10^8 rows per step, which made the scatter the dominant
training cost (round-3 profiling).

:func:`aggregate_rows` computes the same dense result from vectorizable
primitives only:

    sort rows by segment id  ->  running cumsum  ->  segment boundaries by
    ``searchsorted(method='sort')`` (a merge, not binary search)  ->  two
    boundary gathers, difference.

Measured ~2.3x scatter-add at 18M rows / 5.8M segments and ~4x at 36M rows
/ 0.5M segments.  Numerics: segment sums come from differences of a global
f32 cumsum — relative error ~1e-5 at 10^7 rows (XLA's prefix scan is
log-depth), which is noise at gradient scale; exact order-independent
equality with scatter-add is NOT guaranteed.

Small inputs fall back to the plain scatter (the sort pipeline has fixed
overhead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# below this many rows the serialized scatter is cheaper than the sort
# pipeline's fixed overhead
_SCATTER_MAX_ROWS = 262144


def aggregate_rows(idx: jax.Array, vals: jax.Array, num_segments: int,
                   method: str = "auto") -> jax.Array:
    """Dense segment sum: ``out[s] = sum(vals[idx == s])`` -> ``[S, F]``.

    Args:
      idx: ``[N]`` int32 segment ids in ``[0, num_segments)``.
      vals: ``[N, F]`` rows.
      num_segments: static segment count S.
      method: ``'auto' | 'sort' | 'scatter'``.
    """
    N, F = vals.shape
    if method == "auto":
        method = "scatter" if N <= _SCATTER_MAX_ROWS else "sort"
    if method == "scatter":
        return jnp.zeros((num_segments, F), vals.dtype).at[idx].add(vals)

    si, perm = jax.lax.sort(
        (idx.astype(jnp.int32), jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    sv = jnp.take(vals, perm, axis=0)                       # one row gather
    c = jnp.cumsum(sv, axis=0)
    z = jnp.concatenate([jnp.zeros((1, F), c.dtype), c], axis=0)
    ends = jnp.searchsorted(si, jnp.arange(num_segments, dtype=jnp.int32),
                            side="right", method="sort")
    starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    return jnp.take(z, ends, axis=0) - jnp.take(z, starts, axis=0)
