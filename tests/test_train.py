"""End-to-end training smoke test on synthetic data (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem, TrainState
from intrinsicavatar_tpu.train.schedules import C, C_static, lr_schedule
from intrinsicavatar_tpu.utils.default_config import tiny_config


def test_schedules():
    # constant
    assert float(C(0.1, 0)) == pytest.approx(0.1)
    # step function [v0, v1, end]
    assert float(C([1.5, 0.0, 100], 50)) == 1.5
    assert float(C([1.5, 0.0, 100], 100)) == 0.0
    # gated ramp [start, v0, v1, end]
    assert float(C([100, 1.0, 0.0, 200], 50)) == 0.0
    assert float(C([100, 1.0, 0.0, 200], 150)) == pytest.approx(0.5)
    assert C_static([100, 1.0, 0.0, 200], 150) == pytest.approx(0.5)
    # lr: warmup then multistep
    assert float(lr_schedule(0, 1e-3, 1000, 0.01)) == pytest.approx(1e-5)
    assert float(lr_schedule(1000, 1e-3)) == pytest.approx(1e-3)
    assert float(lr_schedule(13000, 1e-3)) == pytest.approx(3e-4)
    assert float(lr_schedule(24000, 1e-3)) == pytest.approx(1e-3 * 0.3**4)


def make_batch(R=16, rng=None):
    rng = rng or np.random.default_rng(0)
    target = np.array([0.0, 0.3, 2.0]) + rng.normal(scale=0.12, size=(R, 3))
    rays_o = np.zeros((R, 3), np.float32)
    rays_d = (target / np.linalg.norm(target, axis=-1, keepdims=True)
              ).astype(np.float32)
    near = np.full((R,), 1.0, np.float32)
    far = np.full((R,), 3.0, np.float32)
    rays = np.concatenate([rays_o, rays_d, near[:, None], far[:, None]], -1)
    return {
        "rays": jnp.asarray(rays),
        "rgb": jnp.full((R, 3), 0.6),
        "alpha": jnp.ones((R,)),
        "index": jnp.asarray([0]),
        "betas": jnp.zeros(10),
        "body_pose": jnp.zeros(69),
        "global_orient": jnp.zeros(3),
        "transl": jnp.asarray([0.0, 0.3, 2.0]),
    }


@pytest.fixture(scope="module")
def system_state():
    cfg = tiny_config()
    cfg.trainer.max_steps = 40
    sys = IntrinsicAvatarSystem(cfg)
    state = sys.setup(np.zeros(10), jax.random.PRNGKey(0))
    return sys, state


def test_train_step_runs_and_descends(system_state):
    sys, state = system_state
    rng = np.random.default_rng(0)
    batch = make_batch(rng=rng)

    def data_iter():
        while True:
            yield batch, 0.0

    # log_every=1 so the (step, scalars) history covers every step
    state, hist = sys.fit(data_iter(), state, max_steps=25, log_every=1)
    assert len(hist) == 25 and hist[0][0] == 0
    first = float(hist[0][1]["rgb_l1"])
    last = float(hist[-1][1]["rgb_l1"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"rgb_l1 did not decrease: {first} -> {last}"
    # params stay finite
    leaves = jax.tree.leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert int(state.step) == 25


def test_grad_accum_matches_monolithic(system_state):
    """trainer.grad_accum=2 must match the monolithic step when the forward
    is deterministic (no material jitter / curvature rng) and every chunk
    sees the same valid-ray statistics."""
    sys, state = system_state
    batch = make_batch(R=32)
    # identical rays -> every chunk has the global valid-ray statistics, so
    # average-of-chunk-means == global mean exactly
    batch = {**batch,
             "rays": jnp.broadcast_to(batch["rays"][:1], batch["rays"].shape)}
    flags = sys.flags_for_step(5000)._replace(
        jitter_materials=False, with_curvature_loss=False, randomized=False)

    n_accum = sys.config.trainer.get("grad_accum", 1)
    try:
        sys.config.trainer.grad_accum = 1
        s1, l1 = sys.train_step(state, batch, 0.0, flags)
        sys.config.trainer.grad_accum = 2
        s2, l2 = sys.train_step(state, batch, 0.0, flags)
    finally:
        sys.config.trainer.grad_accum = n_accum

    # batch-size-dependent matmul tiling perturbs the Broyden root finder at
    # the ulp level; the tolerances below are the observed chaos floor (an
    # averaging/scaling bug would be off by 2x, far outside them)
    np.testing.assert_allclose(float(l1["rgb_l1"]), float(l2["rgb_l1"]),
                               rtol=2.5e-2)
    for p1, p2 in zip(jax.tree.leaves(s1.params),
                      jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-2, atol=1e-4)
    assert int(s2.step) == int(state.step) + 1


def test_occ_update_shrinks_grid(system_state):
    sys, state = system_state
    batch = make_batch()
    occ0 = int(np.asarray(state.occ.binaries).sum())
    # advance state far enough that the SDF is meaningful, then occ update
    st = state._replace(step=jnp.asarray(100, jnp.int32))
    st = sys.occ_update_step(st, batch, 0.0)
    occ1 = int(np.asarray(st.occ.binaries).sum())
    assert occ1 < occ0, "occupancy update should prune empty space"
    assert occ1 > 0, "body region must stay occupied"


def test_reinit_occupancy_grid(system_state):
    sys, state = system_state
    batch = make_batch()
    st = sys.reinit_occupancy_grid(state, [batch, batch])
    assert st.occ.binaries.shape[0] == 2
    assert int(np.asarray(st.occ.binaries).sum()) > 0


def test_train_seed_grid_phys_step():
    """Per-step baked grid for the phys training regime: the bake happens
    in sample_step (phys steps only), threads into the shading stage, and
    the step's losses stay finite and comparable to the exact path.  The
    placement/seeding equivalence itself is covered at render level by
    tests/test_seedgrid.py — this pins the training wiring."""
    from intrinsicavatar_tpu.anim.seedgrid import SeedGrid
    from intrinsicavatar_tpu.utils.config import merge

    cfg = merge(tiny_config(), {"model": {
        "train_seed_grid": True, "train_seed_grid_resolution": 24}})
    sys_on = IntrinsicAvatarSystem(cfg)
    state_on = sys_on.setup(np.zeros(10), jax.random.PRNGKey(0))
    sys_off = IntrinsicAvatarSystem(tiny_config())
    state_off = sys_off.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=16)

    # radiance step: no bake even when enabled (phys-regime-only lever)
    rad_flags = sys_on.flags_for_step(5000)
    _, _, grid = sys_on.sample_step(
        state_on._replace(step=jnp.asarray(5000, jnp.int32)), batch, 0.0,
        rad_flags)
    assert grid is None

    phys_flags = sys_on.flags_for_step(11000)._replace(
        jitter_materials=False, with_curvature_loss=False, randomized=False)
    st_on = state_on._replace(step=jnp.asarray(11000, jnp.int32))
    st_off = state_off._replace(step=jnp.asarray(11000, jnp.int32))
    _, _, grid = sys_on.sample_step(st_on, batch, 0.0, phys_flags)
    assert isinstance(grid, SeedGrid) and grid.has_sdf

    s_on, l_on = sys_on.train_step(st_on, batch, 0.0, phys_flags)
    s_off, l_off = sys_off.train_step(st_off, batch, 0.0, phys_flags)
    assert np.isfinite(float(l_on["total"]))
    assert int(s_on.step) == 11001
    # same rngs, same init: only sample *placement* differs (grid-read
    # sdf vs queried sdf) — the phys loss must stay in the same regime
    a, b = float(l_on["rgb_phys_l1"]), float(l_off["rgb_phys_l1"])
    assert abs(a - b) <= 0.25 * max(abs(b), 0.05), (a, b)
    # grads flow: params moved
    moved = any(
        not np.allclose(np.asarray(p1), np.asarray(p0))
        for p0, p1 in zip(jax.tree.leaves(st_on.params),
                          jax.tree.leaves(s_on.params)))
    assert moved


def test_train_seeded_primary_matches_searched():
    """With the per-step grid on, `train_seed_grid_primary` routes the
    primary shading pass through the seeded polish (+ the train-mode
    pose-gradient correction) instead of the full multi-init search.
    Both paths share the SAME baked importance placement, and the polish
    converges to the search's root (tests/test_pbr.py), so the rendered
    losses and the updated params must agree tightly."""
    from intrinsicavatar_tpu.utils.config import merge

    def make(primary):
        cfg = merge(tiny_config(), {"model": {
            "train_seed_grid": True, "train_seed_grid_resolution": 24,
            "train_seed_grid_primary": primary}})
        s = IntrinsicAvatarSystem(cfg)
        return s, s.setup(np.zeros(10), jax.random.PRNGKey(0))

    sys_p, state_p = make(True)
    sys_s, state_s = make(False)
    batch = make_batch(R=16)
    flags = sys_p.flags_for_step(11000)._replace(
        jitter_materials=False, with_curvature_loss=False, randomized=False)
    st_p = state_p._replace(step=jnp.asarray(11000, jnp.int32))
    st_s = state_s._replace(step=jnp.asarray(11000, jnp.int32))
    s1, l1 = sys_p.train_step(st_p, batch, 0.0, flags)
    s2, l2 = sys_s.train_step(st_s, batch, 0.0, flags)
    np.testing.assert_allclose(float(l1["rgb_l1"]), float(l2["rgb_l1"]),
                               rtol=2e-2)
    np.testing.assert_allclose(float(l1["eikonal"]), float(l2["eikonal"]),
                               rtol=5e-2, atol=1e-3)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-2, atol=1e-4)


def test_fit_async_checkpoint_and_boost_init(system_state):
    """fit() submits checkpoint saves to a background thread (one in
    flight, joined in order) and system.budget_boost_init seeds the
    overflow-escalator level that a resumed run otherwise re-learns
    through recompiles."""
    import copy

    sys_, state = system_state
    batch = make_batch()

    def data_iter():
        while True:
            yield batch, 0.0

    saved = []

    def ckpt_fn(st, step):
        # device_get inside the worker thread, like the real orbax saver
        saved.append((step, int(jax.device_get(st.step))))

    st = state._replace(step=jnp.asarray(0, jnp.int32))
    _, _ = sys_.fit(data_iter(), st, max_steps=5, log_every=10,
                    ckpt_fn=ckpt_fn, ckpt_every=2)
    # steps 2 and 4 checkpointed, in order; the saved state is post-update
    # (train_step has already advanced state.step to step+1)
    assert saved == [(2, 3), (4, 5)]

    cfg = copy.deepcopy(sys_.config)
    cfg.system.budget_boost_init = 3
    boosted = IntrinsicAvatarSystem(cfg)
    assert boosted.flags_for_step(0).budget_boost == 3


def test_fit_deadline_stops_early(system_state):
    """fit(deadline_ts=<past>) completes exactly one step, then exits the
    loop cleanly (the launcher saves ckpt/final from the returned state),
    so a wall-bounded training stage always frees the device for the
    relight/bench stages with a resumable lineage."""
    import time

    sys_, state = system_state
    batch = make_batch()

    def data_iter():
        while True:
            yield batch, 0.0

    st = state._replace(step=jnp.asarray(0, jnp.int32))
    t0 = time.time()
    out, hist = sys_.fit(data_iter(), st, max_steps=500, log_every=1,
                         deadline_ts=t0 - 1.0)
    assert int(out.step) == 1, "one step runs before the deadline check"
    assert len(hist) == 1 and hist[0][0] == 0


def test_train_seed_grid_phys_step_grad_accum():
    """The live r5 recipe combination — phys regime + per-step baked
    grid + trainer.grad_accum=2 (fused lax.scan microbatches consuming
    ONE shared bake from sample_step) — runs and stays finite."""
    from intrinsicavatar_tpu.utils.config import merge

    cfg = merge(tiny_config(), {
        "model": {"train_seed_grid": True,
                  "train_seed_grid_resolution": 24},
        "trainer": {"grad_accum": 2}})
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=16)
    flags = sys_.flags_for_step(11000)
    st = state._replace(step=jnp.asarray(11000, jnp.int32))
    s, losses = sys_.train_step(st, batch, 0.0, flags)
    assert np.isfinite(float(losses["total"]))
    assert int(s.step) == 11001
    moved = any(
        not np.allclose(np.asarray(p1), np.asarray(p0))
        for p0, p1 in zip(jax.tree.leaves(st.params),
                          jax.tree.leaves(s.params)))
    assert moved
