"""Occupancy-grid ray marching with rectangular output.

TPU-native replacement for nerfacc's ``traverse_grids`` CUDA kernel (used by
the reference at `models/occ_grid/temporal_occ_grid.py:165-175` and
`models/intrinsic_avatar.py:1170-1196`).  Instead of a per-ray DDA emitting a
ragged interval list, every ray gets a fixed budget of ``S`` uniform steps
between its entry and exit of the scene AABB; a step is a sample iff the
occupancy voxel at its midpoint is set.  The result is returned in the same
*edge-list* form the reference uses (values + is_left/is_right flags over a
``[R, S+1]`` slot array, valid entries left-packed and sorted by t), which the
merge resampler (`ops.resample.merge_resample`) consumes directly.

The uniform-step + midpoint-test formulation marches exactly like nerfacc's
``OccGridEstimator.sampling`` with a constant ``render_step_size`` (the
reference's configuration: cone_angle=0, alpha_thre=0); the DDA's
voxel-boundary interval splits are not reproduced since every consumer only
uses uniform steps.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RayIntervals(NamedTuple):
    """Edge-list sample intervals for a batch of rays (rectangular).

    Interval k of a ray spans ``[vals[k], vals[k+1]]`` and is a *sample* iff
    ``is_left[k] & is_right[k+1]`` — mirroring nerfacc's ``RayIntervals``.
    Valid slots are left-packed and ascending in t; invalid slots hold +inf.
    """

    vals: jax.Array       # [R, E]
    is_left: jax.Array    # [R, E]
    is_right: jax.Array   # [R, E]
    valid: jax.Array      # [R, E]


def ray_aabb_intersect(rays_o: jax.Array, rays_d: jax.Array,
                       aabb: jax.Array):
    """Slab test. ``aabb`` is ``[6]`` (min, max). Returns (t_min, t_max)."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-10, rays_d,
                          jnp.where(rays_d >= 0, 1e-10, -1e-10))
    t0 = (aabb[:3] - rays_o) * inv
    t1 = (aabb[3:] - rays_o) * inv
    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_min, t_max


@partial(jax.jit, static_argnames=("num_steps", "concentrate"))
def occupancy_sampling(
    rays_o: jax.Array,        # [R, 3]
    rays_d: jax.Array,        # [R, 3] (normalized)
    binaries: jax.Array,      # [res, res, res] bool (x, y, z order)
    aabb: jax.Array,          # [6]
    step_size: float | jax.Array,
    num_steps: int,
    near: jax.Array | None = None,   # [R]
    far: jax.Array | None = None,    # [R]
    stratified_u: jax.Array | None = None,  # [R] in [0,1)
    concentrate: int = 0,
) -> RayIntervals:
    """March rays through the binary grid; emit edge-list intervals.

    ``stratified_u`` shifts each ray's march start by ``u * step_size``
    (matching `temporal_occ_grid.py:164-166`).

    ``concentrate = c > 0`` enables DDA-parity sample concentration: the
    ray is probed at ``c``-times finer steps over the same march length,
    and up to ``num_steps`` *occupied* probe steps are kept — every
    sample then lands inside occupied space (the property of nerfacc's
    DDA the uniform march loses), and thin structures get up to ``c``-x
    finer sampling.  When a ray crosses more than ``num_steps`` occupied
    probe steps the kept set is a stratified (every ``n_occ/S``-th)
    subset — an evenly-thinned march at an effective step no coarser
    than the ``concentrate=0`` step, replacing the uniform march's
    far-tail truncation bias.  The edge-slot width grows from ``S+1``
    to ``c*S + 1``.
    """
    R = rays_o.shape[0]
    S = num_steps
    res = binaries.shape[0]
    c = int(concentrate)
    P = c * S if c > 0 else S                     # probe steps
    dt = step_size / c if c > 0 else step_size

    t_enter, t_exit = ray_aabb_intersect(rays_o, rays_d, aabb)
    t_enter = jnp.maximum(t_enter, 0.0)
    if near is not None:
        t_enter = jnp.maximum(t_enter, near)
    if far is not None:
        t_exit = jnp.minimum(t_exit, far)
    if stratified_u is not None:
        t_enter = t_enter + stratified_u * dt

    i = jnp.arange(P + 1, dtype=rays_o.dtype)
    edges = t_enter[:, None] + i[None, :] * dt                 # [R, P+1]

    mids = 0.5 * (edges[:, :-1] + edges[:, 1:])                # [R, P]
    pos = rays_o[:, None, :] + rays_d[:, None, :] * mids[..., None]
    ext = aabb[3:] - aabb[:3]
    v = jnp.floor((pos - aabb[:3]) / ext * res).astype(jnp.int32)
    in_grid = jnp.all((v >= 0) & (v < res), axis=-1)
    vc = jnp.clip(v, 0, res - 1)
    occ = binaries[vc[..., 0], vc[..., 1], vc[..., 2]]
    hit = t_exit > t_enter
    occ = occ & in_grid & (edges[:, 1:] <= t_exit[:, None]) & hit[:, None]

    if c > 0:
        # stratified selection of at most S occupied probe steps
        cum = jnp.cumsum(occ.astype(jnp.int32), axis=1)        # [R, P]
        n_occ = cum[:, -1]                                     # [R]
        k = jnp.arange(S, dtype=jnp.int32)
        # rank of the k-th stratum's representative (n_occ > S branch);
        # ranks are strictly increasing so no probe step repeats
        r = jnp.floor(((k[None, :] + 0.5) * n_occ[:, None]) / S
                      ).astype(jnp.int32)                      # [R, S]
        j = jax.vmap(lambda cr, rr: jnp.searchsorted(
            cr, rr + 1, side="left"))(cum, r)                  # [R, S]
        j = jnp.clip(j, 0, P - 1)
        sel_strat = jnp.zeros((R, P), bool).at[
            jnp.arange(R)[:, None], j].set(True) & occ
        occ = jnp.where((n_occ <= S)[:, None], occ, sel_strat)

    occ_pad_l = jnp.pad(occ, ((0, 0), (1, 0)))                 # occ[i-1]
    is_left = jnp.pad(occ, ((0, 0), (0, 1)))                   # edge opens i
    is_right = occ_pad_l                                       # edge closes i-1
    valid = is_left | is_right

    # left-pack valid edges (t order preserved; cumsum-based partition)
    from intrinsicavatar_tpu.ops.compact import stable_partition_rows
    vals = jnp.where(valid, edges, jnp.inf)
    order = stable_partition_rows(valid)
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    return RayIntervals(vals=take(vals), is_left=take(is_left),
                        is_right=take(is_right), valid=take(valid))


def intervals_to_samples(iv: RayIntervals):
    """Edge list -> per-interval (t_starts, t_ends, mask), ``[R, E-1]`` each.

    Interval k spans edges (k, k+1); valid iff ``is_left[k] & is_right[k+1]``.
    """
    mask = iv.is_left[:, :-1] & iv.is_right[:, 1:] & iv.valid[:, :-1] \
        & iv.valid[:, 1:]
    t_starts = jnp.where(mask, iv.vals[:, :-1], 0.0)
    t_ends = jnp.where(mask, iv.vals[:, 1:], 0.0)
    return t_starts, t_ends, mask
