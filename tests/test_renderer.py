"""End-to-end renderer tests on the tiny config + synthetic body."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.render.renderer import IntrinsicAvatar, RenderFlags
from intrinsicavatar_tpu.render.occupancy import make_occ_grid
from intrinsicavatar_tpu.utils.default_config import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = IntrinsicAvatar(cfg.model)
    statics = model.initialize(np.zeros(10))
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "index": jnp.asarray([0]),
        "betas": jnp.zeros(10),
        "body_pose": jnp.zeros(69),
        "global_orient": jnp.zeros(3),
        "transl": jnp.asarray([0.0, 0.3, 2.0]),
    }
    frame, cond = model.prepare(params, statics, batch, global_step=0)
    occ = make_occ_grid(np.asarray(cfg.model.scene_aabb)[None],
                        resolution=cfg.model.occ_resolution)
    # camera at world origin; body sits at transl=(0, 0.3, 2)
    R = 8
    rng = np.random.default_rng(1)
    target = np.array([0.0, 0.3, 2.0]) + rng.normal(scale=0.15, size=(R, 3))
    rays_o = np.zeros((R, 3), np.float32)
    rays_d = target / np.linalg.norm(target, axis=-1, keepdims=True)
    near = np.full((R, 1), 1.0, np.float32)
    far = np.full((R, 1), 3.0, np.float32)
    rays = jnp.asarray(np.concatenate(
        [rays_o, rays_d.astype(np.float32), near, far], -1))
    return dict(cfg=cfg, model=model, statics=statics, params=params,
                frame=frame, cond=cond, occ=occ, rays=rays)


def test_radiance_forward_shapes_and_hits(setup):
    m = setup["model"]
    flags = RenderFlags(training=True, enable_phys=False,
                        importance_sample=False, randomized=True)
    out = m.forward(setup["params"], setup["statics"], setup["frame"],
                    setup["cond"], setup["occ"], setup["rays"],
                    jax.random.PRNGKey(2), 0, flags,
                    background_color=jnp.zeros(3))
    R = setup["rays"].shape[0]
    assert out["comp_rgb"].shape == (R, 3)
    assert out["comp_normal"].shape == (R, 3)
    assert out["opacity"].shape == (R, 1)
    assert out["depth"].shape == (R, 1)
    for k in ("comp_rgb", "opacity", "depth", "comp_rgb_full",
              "sdf_samples", "sdf_grad_samples", "weights"):
        assert np.all(np.isfinite(np.asarray(out[k]))), f"{k} not finite"
    # rays point at the body: geometry starts as a sphere, so some opacity
    assert float(out["opacity"].max()) > 0.5
    # depth of hit rays is near the body distance (~2)
    hit = np.asarray(out["opacity"][:, 0]) > 0.5
    d = np.asarray(out["depth"][:, 0])[hit]
    assert np.all((d > 1.0) & (d < 3.0))


def test_radiance_forward_importance(setup):
    m = setup["model"]
    flags = RenderFlags(training=True, enable_phys=False,
                        importance_sample=True, randomized=True)
    out = m.forward(setup["params"], setup["statics"], setup["frame"],
                    setup["cond"], setup["occ"], setup["rays"],
                    jax.random.PRNGKey(2), 2000, flags,
                    background_color=jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(out["comp_rgb"])))
    assert float(out["opacity"].max()) > 0.5


def test_phys_forward(setup):
    m = setup["model"]
    flags = RenderFlags(training=True, enable_phys=True,
                        importance_sample=True, randomized=True,
                        render_mode="uniform_light")
    out = m.forward(setup["params"], setup["statics"], setup["frame"],
                    setup["cond"], setup["occ"], setup["rays"],
                    jax.random.PRNGKey(3), 11000, flags,
                    background_color=jnp.zeros(3))
    R = setup["rays"].shape[0]
    for k in ("comp_rgb_phys", "comp_demod_phys", "comp_albedo",
              "comp_roughness", "comp_metallic", "visibility",
              "albedo_smoothness_loss_map"):
        assert k in out, k
        assert np.all(np.isfinite(np.asarray(out[k]))), f"{k} not finite"
    assert out["comp_rgb_phys"].shape == (R, 3)
    assert float(out["comp_rgb_phys"].max()) > 0.0


@pytest.mark.parametrize("mode", ["light", "mats", "mis"])
def test_eval_render_modes(setup, mode):
    """The three eval PBR modes (`models/intrinsic_avatar.py:1344-1436`)
    produce finite, non-trivial physically based renders."""
    m = setup["model"]
    flags = RenderFlags(training=False, enable_phys=True,
                        importance_sample=True, randomized=False,
                        render_mode=mode)
    out = m.forward(setup["params"], setup["statics"], setup["frame"],
                    setup["cond"], setup["occ"], setup["rays"],
                    jax.random.PRNGKey(4), 11000, flags,
                    background_color=jnp.zeros(3))
    R = setup["rays"].shape[0]
    assert out["comp_rgb_phys"].shape == (R, 3)
    for k in ("comp_rgb_phys", "comp_demod_phys", "comp_albedo"):
        assert np.all(np.isfinite(np.asarray(out[k]))), f"{mode}/{k}"
    assert float(out["comp_rgb_phys"].max()) > 0.0, mode


def test_render_mode_estimators_agree_in_expectation(setup):
    """uniform_light / light / mats / mis are Monte-Carlo estimators of the
    same rendering integral (`models/intrinsic_avatar.py:624-645` MIS
    semantics): seed-averaged renders must agree."""
    m = setup["model"]
    means = {}
    for mode in ("uniform_light", "light", "mis"):
        acc = []
        for s in range(6):
            flags = RenderFlags(training=False, enable_phys=True,
                                importance_sample=False, randomized=False,
                                render_mode=mode)
            out = m.forward(setup["params"], setup["statics"],
                            setup["frame"], setup["cond"], setup["occ"],
                            setup["rays"], jax.random.PRNGKey(100 + s),
                            11000, flags, background_color=jnp.zeros(3))
            acc.append(np.asarray(out["comp_rgb_phys"]))
        means[mode] = np.stack(acc).mean(0)
    fg = means["uniform_light"].sum(-1) > 1e-4
    assert fg.any()
    ref = means["uniform_light"][fg]
    for mode in ("light", "mis"):
        rel = (np.abs(means[mode][fg] - ref).mean()
               / max(np.abs(ref).mean(), 1e-6))
        assert rel < 0.35, f"{mode} estimator disagrees: rel={rel:.3f}"
    # MIS (two strategies) should not be noisier than single-strategy light
    # sampling on this diffuse-dominant scene — sanity, not a tight bound


def test_secondary_shader_chunking_matches_monolithic(setup):
    """`secondary_shader_chunk` lax.map chunking must reproduce the
    monolithic secondary march exactly (role of the reference's
    `configs/config.yaml:51`)."""
    from intrinsicavatar_tpu.render.pbr import compute_indirect_radiance
    m = setup["model"]
    params = setup["params"]
    frame, cond = setup["frame"], setup["cond"]
    sched = m._schedules(0)
    occ = setup["occ"]
    rng = np.random.default_rng(5)
    M = 64
    # secondary rays from near the body surface, random directions
    pos = jnp.asarray(np.asarray(frame.vertices)[
        rng.integers(0, frame.vertices.shape[0], M)])
    dirs = rng.normal(size=(M, 3))
    dirs = jnp.asarray((dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
                       .astype(np.float32))
    flags = RenderFlags(training=False, enable_phys=True,
                        importance_sample=False, randomized=False)
    # disable query compaction: chunked and monolithic runs pool budgets
    # over different lane sets, so exact equality needs no budget drops
    old_qc = m.config.get("query_compaction", 0.5)
    old = m.config.get("secondary_shader_chunk", None)
    m.config["query_compaction"] = 0
    try:
        tr1, rgb1 = compute_indirect_radiance(
            m, params, setup["statics"], frame, cond, sched,
            occ.binaries[0], occ.aabbs[0], pos, dirs, 11000, flags)
        m.config["secondary_shader_chunk"] = 16   # force the lax.map path
        tr2, rgb2 = compute_indirect_radiance(
            m, params, setup["statics"], frame, cond, sched,
            occ.binaries[0], occ.aabbs[0], pos, dirs, 11000, flags)
    finally:
        m.config["query_compaction"] = old_qc
        if old is None:
            m.config.pop("secondary_shader_chunk")
        else:
            m.config["secondary_shader_chunk"] = old
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2), atol=1e-5)


def test_secondary_active_compaction_matches_full(setup):
    """`secondary_active_compaction` (gather active rays into a static
    budget before the secondary march) must reproduce the full-lane
    march on active rays and return the inactive fill (tr=0, rgb=0) on
    the rest — the caller masks those out either way."""
    from intrinsicavatar_tpu.render.pbr import compute_indirect_radiance
    m = setup["model"]
    params = setup["params"]
    frame, cond = setup["frame"], setup["cond"]
    sched = m._schedules(0)
    occ = setup["occ"]
    rng = np.random.default_rng(7)
    # budget rounds up to a multiple of 128: M=512 at frac 0.5 gives a
    # real 256-lane budget (not a whole-set permutation), and a 40%
    # active rate keeps it overflow-free
    M = 512
    pos = jnp.asarray(np.asarray(frame.vertices)[
        rng.integers(0, frame.vertices.shape[0], M)])
    dirs = rng.normal(size=(M, 3))
    dirs = jnp.asarray((dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
                       .astype(np.float32))
    active = jnp.asarray(rng.uniform(size=M) < 0.4)
    flags = RenderFlags(training=False, enable_phys=True,
                        importance_sample=False, randomized=False)
    old_qc = m.config.get("query_compaction", 0.5)
    m.config["query_compaction"] = 0
    try:
        tr1, rgb1 = compute_indirect_radiance(
            m, params, setup["statics"], frame, cond, sched,
            occ.binaries[0], occ.aabbs[0], pos, dirs, 11000, flags,
            active=active)
        m.config["secondary_active_compaction"] = 0.5
        tr2, rgb2 = compute_indirect_radiance(
            m, params, setup["statics"], frame, cond, sched,
            occ.binaries[0], occ.aabbs[0], pos, dirs, 11000, flags,
            active=active)
    finally:
        m.config["query_compaction"] = old_qc
        m.config.pop("secondary_active_compaction")
    a = np.asarray(active)
    np.testing.assert_allclose(np.asarray(tr1)[a], np.asarray(tr2)[a],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb1)[a], np.asarray(rgb2)[a],
                               atol=1e-5)
    # inactive lanes return the fill the caller would mask to anyway
    assert np.all(np.asarray(tr2)[~a] == 0.0)
    assert np.all(np.asarray(rgb2)[~a] == 0.0)


def test_gi_off_and_add_emitter_branches():
    """global_illumination=False and add_emitter=True branches
    (`render/pbr.py:207,304-319`) run and stay finite."""
    from intrinsicavatar_tpu.utils.config import merge
    cfg = tiny_config()
    cfg = merge(cfg, {"model": {"global_illumination": False,
                                "add_emitter": True}})
    model = IntrinsicAvatar(cfg.model)
    statics = model.initialize(np.zeros(10))
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "index": jnp.asarray([0]), "betas": jnp.zeros(10),
        "body_pose": jnp.zeros(69), "global_orient": jnp.zeros(3),
        "transl": jnp.asarray([0.0, 0.3, 2.0]),
    }
    frame, cond = model.prepare(params, statics, batch, global_step=0)
    occ = make_occ_grid(np.asarray(cfg.model.scene_aabb)[None],
                        resolution=cfg.model.occ_resolution)
    rng = np.random.default_rng(1)
    target = np.array([0.0, 0.3, 2.0]) + rng.normal(scale=0.15, size=(8, 3))
    rays_d = (target / np.linalg.norm(target, axis=-1, keepdims=True)
              ).astype(np.float32)
    rays = jnp.asarray(np.concatenate(
        [np.zeros((8, 3), np.float32), rays_d,
         np.full((8, 1), 1.0, np.float32),
         np.full((8, 1), 3.0, np.float32)], -1))
    flags = RenderFlags(training=False, enable_phys=True,
                        importance_sample=False, randomized=False,
                        render_mode="light")
    out = model.forward(params, statics, frame, cond, occ, rays,
                        jax.random.PRNGKey(5), 11000, flags,
                        background_color=jnp.zeros(3))
    for k in ("comp_rgb_phys", "comp_rgb_phys_full"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k


def test_albedo_only_prepass_and_alignment(setup):
    """albedo_only skips the PBR stage; albedo_align_ratio scales the
    eval albedo (`models/intrinsic_avatar.py:222,1114-1115,1290`)."""
    m = setup["model"]
    flags = RenderFlags(training=False, enable_phys=True,
                        importance_sample=False, randomized=False,
                        albedo_only=True)
    out = m.forward(setup["params"], setup["statics"], setup["frame"],
                    setup["cond"], setup["occ"], setup["rays"],
                    jax.random.PRNGKey(6), 11000, flags,
                    background_color=jnp.zeros(3))
    assert "comp_albedo" in out and "comp_rgb_phys" not in out
    ratio = jnp.asarray([2.0, 1.0, 0.5])
    out2 = m.forward(setup["params"], setup["statics"], setup["frame"],
                     setup["cond"], setup["occ"], setup["rays"],
                     jax.random.PRNGKey(6), 11000, flags,
                     background_color=jnp.zeros(3),
                     albedo_align_ratio=ratio)
    np.testing.assert_allclose(np.asarray(out2["comp_albedo"]),
                               np.asarray(out["comp_albedo"])
                               * np.asarray(ratio)[None], rtol=1e-5,
                               atol=1e-7)


def test_phys_grad_flows(setup):
    m = setup["model"]
    flags = RenderFlags(training=True, enable_phys=True,
                        importance_sample=False, randomized=False,
                        render_mode="uniform_light", jitter_materials=False,
                        with_curvature_loss=False)

    def loss_fn(params):
        out = m.forward(params, setup["statics"], setup["frame"],
                        setup["cond"], setup["occ"], setup["rays"],
                        jax.random.PRNGKey(3), 11000, flags,
                        background_color=jnp.zeros(3))
        return (jnp.mean(out["comp_rgb_phys"]) + jnp.mean(out["comp_rgb"]))

    g = jax.grad(loss_fn)(setup["params"])
    # Note: the geometry hash TABLE has exactly zero grad at init because
    # sphere init zeroes first-layer weights on encoding inputs
    # (reference network_utils.py:229); check the MLP instead.
    leaves = {
        "geometry": g["geometry"]["mlp"][0]["v"],
        "radiance": g["radiance"]["table"],
        "material": g["material"]["mlp"][0]["w"],
        "emitter": jax.tree.leaves(g["emitter"])[0],
        "density": g["density"]["beta"],
    }
    for name, leaf in leaves.items():
        s = float(jnp.sum(jnp.abs(leaf)))
        assert np.isfinite(s), f"{name} grad not finite"
        assert s > 0, f"{name} got zero grad"
