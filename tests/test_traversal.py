"""Occupancy-grid marching: uniform-step semantics + DDA-parity
concentration (`ops/grid_traversal.occupancy_sampling`).

The reference marches with nerfacc's DDA (`traverse_grids`), which never
spends samples on unoccupied space.  ``concentrate=c`` restores that
property rectangularly: probe at c-x finer steps, keep up to S occupied
probe steps (stratified thinning beyond S)."""

import jax
import jax.numpy as jnp
import numpy as np

from intrinsicavatar_tpu.ops.grid_traversal import (
    occupancy_sampling, intervals_to_samples,
)


def _setup(res=16, occupied=None):
    """A grid with an occupied slab in z (rays march +z)."""
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    binaries = np.zeros((res, res, res), bool)
    if occupied is not None:
        binaries[:, :, occupied] = True
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]] * 4)
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    return rays_o, rays_d, jnp.asarray(binaries), aabb


def _voxel_z(aabb, res, t, rays_o=-2.0):
    z = rays_o + np.asarray(t)
    return np.floor((z - float(aabb[2])) / 2.0 * res).astype(int)


def test_uniform_march_samples_only_occupied():
    res = 16
    rays_o, rays_d, binaries, aabb = _setup(res, occupied=slice(6, 10))
    iv = occupancy_sampling(rays_o, rays_d, binaries, aabb, 0.05, 64)
    ts, te, m = intervals_to_samples(iv)
    mids = np.asarray(0.5 * (ts + te))[np.asarray(m)]
    vz = _voxel_z(aabb, res, mids)
    assert len(mids) > 0
    assert ((vz >= 6) & (vz < 10)).all()


def test_concentrate_matches_march_length_and_occupancy():
    res = 16
    rays_o, rays_d, binaries, aabb = _setup(res, occupied=slice(6, 8))
    S, dt = 64, 0.05
    iv0 = occupancy_sampling(rays_o, rays_d, binaries, aabb, dt, S)
    iv2 = occupancy_sampling(rays_o, rays_d, binaries, aabb, dt, S,
                             concentrate=2)
    ts0, te0, m0 = intervals_to_samples(iv0)
    ts2, te2, m2 = intervals_to_samples(iv2)
    n0 = int(np.asarray(m0).sum())
    n2 = int(np.asarray(m2).sum())
    # occupied span = 2/16 of [-1,1] = 0.25 -> 5 steps at dt, 10 at dt/2;
    # the slab fits S, so concentration keeps every occupied probe step
    assert n2 >= 2 * n0 - 4 * 2   # boundary steps can differ per ray
    # all concentrated samples are inside the slab and dt/2 wide
    mids = np.asarray(0.5 * (ts2 + te2))[np.asarray(m2)]
    vz = _voxel_z(aabb, res, mids)
    assert ((vz >= 6) & (vz < 8)).all()
    widths = np.asarray(te2 - ts2)[np.asarray(m2)]
    np.testing.assert_allclose(widths, dt / 2, rtol=1e-5)


def test_concentrate_thins_when_over_budget():
    """Fully occupied grid: 2S occupied probe steps -> exactly S kept,
    stratified (every other)."""
    res = 8
    rays_o, rays_d, binaries, aabb = _setup(res)
    binaries = jnp.ones_like(binaries)
    S, dt = 16, 0.05
    iv = occupancy_sampling(rays_o, rays_d, binaries, aabb, dt, S,
                            concentrate=2)
    ts, te, m = intervals_to_samples(iv)
    per_ray = np.asarray(m).sum(axis=1)
    # march length S*dt=0.8 from entry t=1.0 is fully inside the aabb
    assert (per_ray == S).all()
    # strata: consecutive kept samples are one probe step apart
    row = np.asarray(ts[0])[np.asarray(m[0])]
    gaps = np.diff(np.sort(row))
    np.testing.assert_allclose(gaps, dt, atol=1e-6)


def test_concentrate_zero_is_the_uniform_path():
    res = 16
    rays_o, rays_d, binaries, aabb = _setup(res, occupied=slice(5, 11))
    a = occupancy_sampling(rays_o, rays_d, binaries, aabb, 0.04, 32)
    b = occupancy_sampling(rays_o, rays_d, binaries, aabb, 0.04, 32,
                           concentrate=0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_step_with_concentration_runs():
    from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
    from intrinsicavatar_tpu.utils.default_config import tiny_config
    from test_train import make_batch

    cfg = tiny_config()
    cfg.model.march_concentrate = 2
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=128)
    flags = sys_.flags_for_step(600)
    state, losses = sys_.train_step(state, batch, 0.0, flags)
    assert np.isfinite(float(losses["total"]))
    assert float(losses["rgb_mse"]) < 1.0
