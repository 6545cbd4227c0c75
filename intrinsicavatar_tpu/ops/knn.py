"""Brute-force K-nearest-neighbors (points to points).

Replaces the pytorch3d KNN CUDA extract used once at init by the reference
(`lib/pytorch3d/ops.py:123`, called from
`models/deformers/fast_snarf/deformer_torch.py:236` with K=30 against the
6890 SMPL vertices).  A chunked ``lax.top_k`` over the full distance matrix
is plenty — this is a one-shot initialization, not a hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2, 3))
def knn_points(query: jax.Array, points: jax.Array, k: int,
               chunk: int = 8192):
    """For each query point return its ``k`` nearest points.

    Args:
      query:  ``[N, 3]``
      points: ``[M, 3]``
      k: number of neighbors.
      chunk: query chunk size (static).

    Returns:
      ``(dists2, idx)``: squared distances ``[N, k]`` (ascending) and indices
      ``[N, k]``.
    """
    N = query.shape[0]
    pad = (-N) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)

    def body(qc):
        d2 = (
            jnp.sum(qc**2, -1, keepdims=True)
            - 2.0 * qc @ points.T
            + jnp.sum(points**2, -1)[None, :]
        )
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d2, idx = jax.lax.map(body, q)
    d2 = d2.reshape(-1, k)[:N]
    idx = idx.reshape(-1, k)[:N]
    return jnp.maximum(d2, 0.0), idx
