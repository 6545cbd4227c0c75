"""Temporal and per-frame-test occupancy grids (functional state).

Equivalents of taconite/IntrinsicAvatar:

  * ``TemporalOccGridEstimator`` (`models/occ_grid/temporal_occ_grid.py`):
    one binary 64^3 level per time index; EMA-max update every n=20 steps on
    the current frame's level with 3^3 max-pool dilation, an adaptive
    threshold ``min(mean(occ), occ_thre)``, and a max-connected-component
    filter that kills floaters.
  * the eval-time per-frame grid (`models/intrinsic_avatar.py:307-381`):
    built fresh in *deformed* space from 3 jittered samples per voxel.

State is an explicit pytree (:class:`OccGridState`); updates are jitted pure
functions so they can run inside the training loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.ops.morphology import max_pool3d, max_connected_component


class OccGridState(NamedTuple):
    occs: jax.Array      # [T, res^3] float EMA occupancy
    binaries: jax.Array  # [T, res, res, res] bool
    aabbs: jax.Array     # [T, 6]


def make_occ_grid(aabbs: np.ndarray, resolution: int = 64) -> OccGridState:
    """``aabbs``: ``[T, 6]`` — one level per time index (T=1 before the
    per-frame re-init at step 8000, `systems/intrinsic_avatar.py:46-79`)."""
    aabbs = jnp.atleast_2d(jnp.asarray(aabbs, jnp.float32))
    T = aabbs.shape[0]
    return OccGridState(
        occs=jnp.zeros((T, resolution**3), jnp.float32),
        binaries=jnp.ones((T, resolution, resolution, resolution), bool),
        aabbs=aabbs,
    )


def level_of(state: OccGridState, t_idx) -> jax.Array:
    """Temporal level selection: ``floor(t_idx * T)``
    (`temporal_occ_grid.py:165-167`)."""
    T = state.binaries.shape[0]
    return jnp.clip(jnp.floor(t_idx * T).astype(jnp.int32), 0, T - 1)


def grid_coords(resolution: int) -> jax.Array:
    """Integer voxel coordinates ``[res^3, 3]`` in x-major (x,y,z) order."""
    r = jnp.arange(resolution)
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x, y, z], -1).reshape(-1, 3)


def sample_voxel_points(key: jax.Array, aabb: jax.Array, resolution: int,
                        n_samples: int = 1) -> jax.Array:
    """Jittered sample positions, ``n_samples`` per voxel: ``[res^3 * n, 3]``."""
    gc = grid_coords(resolution).astype(jnp.float32)          # [V,3]
    gc = jnp.repeat(gc[:, None, :], n_samples, axis=1)
    u = jax.random.uniform(key, gc.shape)
    x = (gc + u) / resolution
    return (aabb[:3] + x * (aabb[3:] - aabb[:3])).reshape(-1, 3)


def update_occ_grid(
    state: OccGridState,
    level: jax.Array,
    occ_eval_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    occ_thre: float = 0.001,
    ema_decay: float = 0.8,
) -> OccGridState:
    """EMA-max update of one level (`temporal_occ_grid.py:369-411`).

    ``occ_eval_fn`` maps jittered world points ``[V,3]`` to per-point alphas.
    """
    res = state.binaries.shape[1]
    aabb = state.aabbs[level]
    x = sample_voxel_points(key, aabb, res, n_samples=1)
    occ = occ_eval_fn(x).reshape(-1)

    occs_lvl = jnp.maximum(state.occs[level] * ema_decay, occ)
    occs = state.occs.at[level].set(occs_lvl)

    pooled = max_pool3d(occs_lvl.reshape(res, res, res)).reshape(-1)
    thre = jnp.minimum(jnp.mean(pooled), occ_thre)
    binary = (pooled > thre).reshape(res, res, res)
    binary = max_connected_component(binary)
    return OccGridState(occs=occs,
                        binaries=state.binaries.at[level].set(binary),
                        aabbs=state.aabbs)


@partial(jax.jit, static_argnames=("occ_eval_fn", "resolution", "n_samples"))
def compute_test_occ_grid(
    occ_eval_fn: Callable,
    aabb: jax.Array,
    key: jax.Array,
    resolution: int = 64,
    n_samples: int = 3,
    occ_thre: float = 0.01,
):
    """Fresh deformed-space grid for eval
    (`models/intrinsic_avatar.py:307-381`): 3 jittered samples per voxel ->
    max -> 3^3 max-pool -> adaptive threshold -> largest component.

    Returns the binary grid ``[res,res,res]``.
    """
    x = sample_voxel_points(key, aabb, resolution, n_samples)
    occ = occ_eval_fn(x).reshape(-1, n_samples).max(axis=1)
    pooled = max_pool3d(occ.reshape(resolution, resolution, resolution))
    thre = jnp.minimum(jnp.mean(pooled), occ_thre)
    binary = pooled > thre
    return max_connected_component(binary)
