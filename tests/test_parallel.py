"""Multi-chip equivalence: sharded train step / render vs single device.

Runs on the 8-virtual-CPU-device mesh that conftest.py configures — the
same mechanism the driver uses to validate the multi-chip path without
real chips (SURVEY §5: ray-axis data parallelism, replicated params,
XLA-inserted gradient all-reduce)."""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
from intrinsicavatar_tpu.utils.default_config import tiny_config
from intrinsicavatar_tpu.parallel import sharding as PS

from test_train import make_batch


@pytest.fixture(scope="module")
def system_state():
    cfg = tiny_config()
    cfg.trainer.grad_accum = 1
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    return sys_, state


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8
    mesh = PS.make_mesh()
    assert mesh.devices.size >= 8


def test_sharded_train_step_matches_single_device(system_state):
    sys_, state = system_state
    batch = make_batch(R=32)
    # deterministic flags (no jitter rng divergence between compiles)
    flags = sys_.flags_for_step(500)._replace(
        randomized=False, with_curvature_loss=False, jitter_materials=False)

    s1, l1 = sys_.train_step_jit(state, batch, 0.0, flags)

    mesh = PS.make_mesh(jax.devices()[:8])
    step_fn = PS.make_sharded_train_step(sys_, mesh, flags, state, batch)
    s2, l2 = step_fn(state, batch, jnp.asarray(0.0))

    # per-device lane counts change XLA tiling inside the Broyden search;
    # tolerances are the observed chaos floor (a broken psum/grad path
    # would be off by ~8x)
    np.testing.assert_allclose(float(l1["total"]), float(l2["total"]),
                               rtol=2.5e-2)
    np.testing.assert_allclose(float(l1["rgb_l1"]), float(l2["rgb_l1"]),
                               rtol=2.5e-2)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-2, atol=2e-4)
    assert int(s2.step) == int(state.step) + 1


def test_sharded_render_matches_unsharded(system_state):
    sys_, state = system_state
    model = sys_.model
    batch = make_batch(R=32)
    flags = sys_.flags_for_step(500, training=False)._replace(
        randomized=False)
    step = jnp.asarray(500, jnp.int32)
    frame, cond = model.prepare(state.params, sys_.statics, batch, step)
    occ = state.occ
    rng = jax.random.PRNGKey(7)
    bg = jnp.ones(3)

    direct = jax.jit(
        lambda rays: model.forward(state.params, sys_.statics, frame, cond,
                                   occ, rays, rng, step, flags, t_idx=0.0,
                                   background_color=bg))(batch["rays"])

    mesh = PS.make_mesh(jax.devices()[:8])
    render = PS.make_sharded_render(model, mesh, flags)
    sharded = render(state.params, sys_.statics, frame, cond, occ,
                     batch["rays"], rng, step, jnp.asarray(0.0), bg)

    for k in ("comp_rgb_full", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(direct[k]),
                                   np.asarray(sharded[k]),
                                   rtol=1e-2, atol=2e-3)


def test_sharded_train_step_deterministic_tight():
    """Deterministic variant at ~1e-5 tolerance (VERDICT round-2 item 7):
    randomness, curvature, material jitter and every compaction path are
    disabled, so the only single-vs-sharded difference is reduction order —
    a wrong psum / per-group gradient would stand out by orders of
    magnitude against this floor."""
    from intrinsicavatar_tpu.utils.default_config import tiny_config as _tc
    cfg = _tc()
    cfg.trainer.grad_accum = 1
    cfg.model.query_compaction = 0.0
    cfg.model.deformer.rigid_deformer.deformer_config.candidate_compaction \
        = 0.0
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(np.zeros(10), jax.random.PRNGKey(0))
    batch = make_batch(R=32)
    flags = sys_.flags_for_step(600)._replace(
        randomized=False, with_curvature_loss=False, jitter_materials=False)
    assert not flags.full_budget

    s1, l1 = sys_.train_step_jit(state, batch, 0.0, flags)

    mesh = PS.make_mesh(jax.devices()[:8])
    step_fn = PS.make_sharded_train_step(sys_, mesh, flags, state, batch)
    s2, l2 = step_fn(state, batch, jnp.asarray(0.0))

    for k in ("total", "rgb_l1", "eikonal", "mask_bce"):
        np.testing.assert_allclose(float(l1[k]), float(l2[k]), rtol=1e-5,
                                   err_msg=f"loss {k}")
    p1, _ = jax.flatten_util.ravel_pytree(s1.params)
    p2, _ = jax.flatten_util.ravel_pytree(s2.params)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-4, atol=1e-6)
