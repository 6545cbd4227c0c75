"""Tests: per-frame baked correspondence grid for eval-time skinning.

The grid (anim/seedgrid.py) must reproduce the full multi-init search's
canonicalization when used as a seed source for ``deform_seeded`` — the
eval/relight fast path's correctness contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.anim import smpl as S
from intrinsicavatar_tpu.anim.seedgrid import (
    SeedGrid, bake_seed_grid, seed_from_grid,
)

from tests.test_anim import make_rigid, frame_params


@pytest.fixture(scope="module")
def body():
    return S.make_synthetic_body_model(n_surface_verts=1200)


def _geometry_fn_factory(center):
    def geometry_fn(x):
        sdf = jnp.linalg.norm(x - center, axis=-1) - 0.4
        grad = (x - center) / jnp.maximum(
            jnp.linalg.norm(x - center, axis=-1, keepdims=True), 1e-6)
        eye = jnp.broadcast_to(jnp.eye(3), (*x.shape[:-1], 3, 3))
        return (sdf, grad, x), eye
    return geometry_fn


def _setup(body):
    d = make_rigid(body)
    statics = d.initialize(np.zeros(10))
    pose = np.zeros(69, np.float32)
    pose[(18 - 1) * 3 + 1] = 0.8
    pose[2], pose[5] = 0.3, -0.3
    frame = d.prepare(statics, frame_params(pose))
    geometry_fn = _geometry_fn_factory(
        jnp.asarray((d.bbox[0] + d.bbox[1]) / 2))
    return d, statics, frame, geometry_fn


def _bake(d, statics, frame, geometry_fn, res=48):
    v = frame.voxel_d.reshape(3, -1)
    aabb = jnp.stack([v.min(1), v.max(1)])

    def deform_fn(p):
        out = d.deform(statics, frame, p, geometry_fn, eval_mode=True)
        return out[0], out[2]

    return bake_seed_grid(deform_fn, aabb, res, chunk=8192)


def test_bake_shapes_and_coverage(body):
    d, statics, frame, geometry_fn = _setup(body)
    grid = _bake(d, statics, frame, geometry_fn, res=32)
    assert isinstance(grid, SeedGrid)
    assert grid.resolution == 32
    assert grid.packed.shape == (32 ** 3, 32)
    # validity channel: a body occupies a minority of its bbox, but the
    # search converges in a margin around it — expect >5% valid nodes
    ok = np.asarray(grid.packed[:, 3::4]).max(axis=1)
    assert 0.05 < ok.mean() <= 1.0


def test_grid_seed_matches_search(body, rng):
    """seed_from_grid + deform_seeded == full deform on posed
    near-surface points (the eval fast path's contract)."""
    d, statics, frame, geometry_fn = _setup(body)
    grid = _bake(d, statics, frame, geometry_fn, res=48)

    N = 512
    sel = rng.choice(frame.vertices.shape[0], N, replace=False)
    pts = jnp.asarray(np.asarray(frame.vertices)[sel]
                      + rng.normal(scale=0.01, size=(N, 3)).astype(
                          np.float32))

    full = d.deform(statics, frame, pts, geometry_fn, eval_mode=True)
    seed_xc, seed_ok = seed_from_grid(grid, pts)
    seeded = d.deform_seeded(statics, frame, pts, seed_xc, seed_ok,
                             geometry_fn, polish_iters=6)

    ok_f = np.asarray(full[2])
    ok_s = np.asarray(seeded[2])
    # near-surface points overwhelmingly have usable grid seeds
    assert np.asarray(seed_ok).mean() > 0.98
    # the polish converges nearly as often as the search
    assert ok_s[ok_f].mean() > 0.95
    m = ok_s & ok_f
    xc_f = np.asarray(full[0])[m]
    xc_s = np.asarray(seeded[0])[m]
    d_root = np.linalg.norm(xc_f - xc_s, axis=-1)
    # same root branch for the vast majority; identical root where same
    assert np.median(d_root) < 1e-4
    assert (d_root < 1e-3).mean() > 0.9
    close = d_root < 1e-3
    np.testing.assert_allclose(np.asarray(seeded[1])[m][close],
                               np.asarray(full[1])[m][close], atol=1e-3)


def test_grid_seed_off_body_invalid(body):
    """Lattice cells far outside the body must return seed_ok=False —
    the caller then fills sdf=1e5 (empty space), not a bogus root."""
    d, statics, frame, geometry_fn = _setup(body)
    grid = _bake(d, statics, frame, geometry_fn, res=32)
    v = frame.voxel_d.reshape(3, -1)
    lo, hi = np.asarray(v.min(1)), np.asarray(v.max(1))
    corner = jnp.asarray(np.stack([lo - 0.0 * (hi - lo),
                                   lo + 0.01 * (hi - lo)]))
    _, seed_ok = seed_from_grid(grid, corner)
    assert not np.any(np.asarray(seed_ok))


def test_incoherent_cell_uses_nearest_corner():
    """A hand-built grid with two root branches in one cell must NOT
    blend across the branch boundary."""
    res = 2
    # 8 nodes: left 4 map to x_c = -1, right 4 map to x_c = +1, all valid
    nodes = np.zeros((res ** 3, 4), np.float32)
    # node layout (z*H + y)*W + x with D=H=W=2
    for z in range(2):
        for y in range(2):
            for x in range(2):
                i = (z * 2 + y) * 2 + x
                nodes[i, 0] = -1.0 if x == 0 else 1.0
                nodes[i, 3] = 1.0
    from intrinsicavatar_tpu.anim.broyden import corner_pack
    packed = corner_pack(
        [jnp.asarray(nodes[:, c]) for c in range(4)], (2, 2, 2), "border")
    grid = SeedGrid(packed=packed, center=jnp.zeros(3),
                    half=jnp.ones(3))
    # query near the left face: linear blend would average the branches
    pts = jnp.asarray([[-0.6, 0.0, 0.0], [0.6, 0.0, 0.0]], jnp.float32)
    seed_xc, seed_ok = seed_from_grid(grid, pts, coh_factor=0.1)
    assert np.all(np.asarray(seed_ok))
    np.testing.assert_allclose(np.asarray(seed_xc)[0, 0], -1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seed_xc)[1, 0], 1.0, atol=1e-5)


def test_coherent_cell_blends():
    """A smooth single-branch cell must interpolate, not snap."""
    res = 2
    nodes = np.zeros((res ** 3, 4), np.float32)
    for z in range(2):
        for y in range(2):
            for x in range(2):
                i = (z * 2 + y) * 2 + x
                # x_c varies linearly and gently with node x
                nodes[i, 0] = 0.1 * x
                nodes[i, 3] = 1.0
    from intrinsicavatar_tpu.anim.broyden import corner_pack
    packed = corner_pack(
        [jnp.asarray(nodes[:, c]) for c in range(4)], (2, 2, 2), "border")
    grid = SeedGrid(packed=packed, center=jnp.zeros(3), half=jnp.ones(3))
    pts = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)   # cell center
    seed_xc, seed_ok = seed_from_grid(grid, pts, coh_factor=3.0)
    assert np.all(np.asarray(seed_ok))
    np.testing.assert_allclose(np.asarray(seed_xc)[0, 0], 0.05, atol=1e-5)


def test_render_with_seed_grid_matches_exact():
    """Full eval render with the baked seed grid vs the searched path:
    opacity/rgb agree to rendering tolerance (the eval fast path must
    not change what the user sees)."""
    from intrinsicavatar_tpu.render.renderer import (
        IntrinsicAvatar, RenderFlags)
    from intrinsicavatar_tpu.render.occupancy import make_occ_grid
    from intrinsicavatar_tpu.utils.default_config import tiny_config

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
    rng_l = np.random.default_rng(3)
    R = 8
    target = np.array([0.0, 0.3, 2.0]) + rng_l.normal(scale=0.15,
                                                      size=(R, 3))
    rays_o = np.zeros((R, 3), np.float32)
    rays_d = (target / np.linalg.norm(target, axis=-1, keepdims=True)
              ).astype(np.float32)
    rays = jnp.asarray(np.concatenate(
        [rays_o, rays_d, np.full((R, 1), 1.0, np.float32),
         np.full((R, 1), 3.0, np.float32)], -1))
    flags = RenderFlags(training=False, enable_phys=False,
                        importance_sample=False, randomized=False)

    grid = model.bake_seed_grid(params, statics, frame, cond, 0,
                                resolution=48, chunk=8192)
    kw = dict(background_color=jnp.zeros(3))
    out0 = model.forward(params, statics, frame, cond, occ, rays,
                         jax.random.PRNGKey(2), 0, flags, **kw)
    out1 = model.forward(params, statics, frame, cond, occ, rays,
                         jax.random.PRNGKey(2), 0, flags,
                         seed_grid=grid, **kw)
    o0 = np.asarray(out0["opacity"])[:, 0]
    o1 = np.asarray(out1["opacity"])[:, 0]
    # contract: the seeded path must never LOSE coverage vs the search.
    # (It may legitimately GAIN it: on grazing rays the pruned multi-init
    # search can miss roots that a short polish from a baked nearby seed
    # recovers — measured here as lanes valid under seeding only, with
    # SDF agreement ~1e-6 where both converge.)
    assert np.all(o1 >= o0 - 5e-3)
    agree = np.abs(o1 - o0) < 5e-3
    assert agree.mean() >= 0.75
    np.testing.assert_allclose(np.asarray(out1["comp_rgb"])[agree],
                               np.asarray(out0["comp_rgb"])[agree],
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(out1["depth"])[agree],
                               np.asarray(out0["depth"])[agree],
                               atol=2e-2)


def test_baked_sdf_channel_matches_direct(body, rng):
    """The grid's SDF channel (gather_from_grid) must track the directly
    queried sdf at near-surface points to within ~a lattice cell of
    Lipschitz-1 error — the placement-accuracy contract of the baked
    secondary coarse pass (render/pbr.py `baked_secondary_coarse`)."""
    from intrinsicavatar_tpu.anim.seedgrid import gather_from_grid

    d, statics, frame, geometry_fn = _setup(body)
    v = frame.voxel_d.reshape(3, -1)
    aabb = jnp.stack([v.min(1), v.max(1)])

    def deform_fn(p):
        out = d.deform(statics, frame, p, geometry_fn, eval_mode=True)
        return out[0], out[2], out[1]        # xc, ok, sdf

    res = 48
    grid = bake_seed_grid(deform_fn, aabb, res, chunk=8192)
    assert grid.has_sdf
    assert grid.packed.shape == (res ** 3, 48)

    N = 512
    sel = rng.choice(frame.vertices.shape[0], N, replace=False)
    pts = jnp.asarray(np.asarray(frame.vertices)[sel]
                      + rng.normal(scale=0.02, size=(N, 3)).astype(
                          np.float32))
    full = d.deform(statics, frame, pts, geometry_fn, eval_mode=True)
    _, ok_g, sdf_g = gather_from_grid(grid, pts)

    m = np.asarray(full[2]) & np.asarray(ok_g)
    assert m.mean() > 0.9
    err = np.abs(np.asarray(sdf_g)[m] - np.asarray(full[1])[m])
    cell = 2.0 * float(np.max(np.asarray(grid.half))) / (res - 1)
    assert np.median(err) < 0.5 * cell
    assert (err < 2.0 * cell).mean() > 0.95
    # off-body: no valid corner -> far-field fill
    far = jnp.asarray(aabb[0][None] + 0.01 * (aabb[1] - aabb[0])[None])
    _, ok_far, sdf_far = gather_from_grid(grid, far)
    assert not bool(np.asarray(ok_far)[0])
    assert float(np.asarray(sdf_far)[0]) > 1e4


def test_baked_coarse_matches_queried_phys_render():
    """`baked_secondary_coarse` (read placement sdf from the grid) vs the
    seeded-query coarse pass: the physically based render must agree to
    placement tolerance — the fine pass re-queries exactly either way."""
    from intrinsicavatar_tpu.render.renderer import (
        IntrinsicAvatar, RenderFlags)
    from intrinsicavatar_tpu.render.occupancy import make_occ_grid
    from intrinsicavatar_tpu.utils.default_config import tiny_config

    outs = {}
    for baked in (False, True):
        cfg = tiny_config()
        cfg.model.phys_kick_in_step = 0
        cfg.model.baked_secondary_coarse = baked
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
        rng_l = np.random.default_rng(3)
        R = 8
        target = np.array([0.0, 0.3, 2.0]) + rng_l.normal(scale=0.15,
                                                          size=(R, 3))
        rays_o = np.zeros((R, 3), np.float32)
        rays_d = (target / np.linalg.norm(target, axis=-1, keepdims=True)
                  ).astype(np.float32)
        rays = jnp.asarray(np.concatenate(
            [rays_o, rays_d, np.full((R, 1), 1.0, np.float32),
             np.full((R, 1), 3.0, np.float32)], -1))
        flags = RenderFlags(training=False, enable_phys=True,
                            importance_sample=False, randomized=False)
        grid = model.bake_seed_grid(params, statics, frame, cond, 0,
                                    resolution=48, chunk=8192)
        assert grid.has_sdf
        outs[baked] = model.forward(
            params, statics, frame, cond, occ, rays, jax.random.PRNGKey(2),
            0, flags, background_color=jnp.zeros(3), seed_grid=grid)

    a, b = outs[False], outs[True]
    for k in ("comp_rgb_phys", "opacity"):
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        assert np.isfinite(vb).all()
        # same secondary directions (same key); only fine-sample PLACEMENT
        # differs (queried sdf vs trilerped sdf), so outputs track closely
        assert np.mean(np.abs(va - vb)) < 3e-2, (k, np.mean(np.abs(va - vb)))


def test_baked_importance_matches_queried_render():
    """`baked_importance` (edge sdf from the grid) vs the seeded-query
    importance rounds: eval radiance render must agree to placement
    tolerance — the primary shading pass re-queries exactly either way."""
    from intrinsicavatar_tpu.render.renderer import (
        IntrinsicAvatar, RenderFlags)
    from intrinsicavatar_tpu.render.occupancy import make_occ_grid
    from intrinsicavatar_tpu.utils.default_config import tiny_config

    outs = {}
    for baked in (False, True):
        cfg = tiny_config()
        cfg.model.baked_importance = baked
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
        rng_l = np.random.default_rng(3)
        R = 8
        target = np.array([0.0, 0.3, 2.0]) + rng_l.normal(scale=0.15,
                                                          size=(R, 3))
        rays_o = np.zeros((R, 3), np.float32)
        rays_d = (target / np.linalg.norm(target, axis=-1, keepdims=True)
                  ).astype(np.float32)
        rays = jnp.asarray(np.concatenate(
            [rays_o, rays_d, np.full((R, 1), 1.0, np.float32),
             np.full((R, 1), 3.0, np.float32)], -1))
        flags = RenderFlags(training=False, enable_phys=False,
                            importance_sample=True, randomized=False)
        grid = model.bake_seed_grid(params, statics, frame, cond, 0,
                                    resolution=48, chunk=8192)
        outs[baked] = model.forward(
            params, statics, frame, cond, occ, rays, jax.random.PRNGKey(2),
            0, flags, background_color=jnp.zeros(3), seed_grid=grid)

    a, b = outs[False], outs[True]
    for k in ("comp_rgb", "opacity", "depth"):
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        assert np.isfinite(vb).all()
        assert np.mean(np.abs(va - vb)) < 3e-2, (k, np.mean(np.abs(va - vb)))
