"""Tests: SMPL forward, LBS voxel, Broyden inverse skinning, deformers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicavatar_tpu.anim import smpl as S
from intrinsicavatar_tpu.anim import lbs_voxel as LV
from intrinsicavatar_tpu.anim import broyden as B
from intrinsicavatar_tpu.anim.broyden import corner_pack
from intrinsicavatar_tpu.anim.deformer import FastSNARF, SNARFDeformer
from intrinsicavatar_tpu.anim.pose import (
    PoseCorrection, DummyPoseEncoder, HierarchicalPoseEncoder,
)
from intrinsicavatar_tpu.utils.config import wrap


@pytest.fixture(scope="module")
def body():
    return S.make_synthetic_body_model(n_surface_verts=1200)


# ------------------------------------------------------------------- SMPL

def test_smpl_rest_pose_identity(body):
    out = S.smpl_forward(body, jnp.zeros(10), jnp.zeros(69))
    np.testing.assert_allclose(np.asarray(out.vertices[0]),
                               body.v_template, atol=1e-5)
    # rest-pose transforms are identity
    A = np.asarray(out.A[0])
    np.testing.assert_allclose(A, np.tile(np.eye(4), (24, 1, 1)), atol=1e-5)


def test_smpl_global_rotation(body):
    aa = jnp.asarray([0.0, 0.0, np.pi / 2])
    out = S.smpl_forward(body, jnp.zeros(10), jnp.zeros(69), global_orient=aa)
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    want = body.v_template @ R.T
    np.testing.assert_allclose(np.asarray(out.vertices[0]), want, atol=1e-4)


def test_smpl_transl_in_A(body):
    t = jnp.asarray([0.5, -0.2, 1.0])
    out = S.smpl_forward(body, jnp.zeros(10), jnp.zeros(69), transl=t)
    np.testing.assert_allclose(np.asarray(out.A[0, :, :3, 3]),
                               np.tile(np.asarray(t), (24, 1)), atol=1e-5)


def test_smpl_elbow_bend_moves_hand_only(body):
    pose = np.zeros(69, np.float32)
    pose[(18 - 1) * 3 + 1] = 1.2  # bend left elbow about y
    out0 = S.smpl_forward(body, jnp.zeros(10), jnp.zeros(69))
    out1 = S.smpl_forward(body, jnp.zeros(10), jnp.asarray(pose))
    j0, j1 = np.asarray(out0.joints[0]), np.asarray(out1.joints[0])
    assert np.linalg.norm(j1[20] - j0[20]) > 0.05    # wrist moved
    np.testing.assert_allclose(j1[:16], j0[:16], atol=1e-5)  # torso fixed


def test_smpl_matches_reference_golden():
    """Golden parity vs the reference smplx ``lbs()`` (dumped by
    scripts/make_smpl_golden.py from `models/deformers/smplx/lbs.py` run
    in float64 on the same synthetic body): verts/joints/A to <=1e-5."""
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "smpl_golden.npz")
    g = np.load(path)
    body = S.make_synthetic_body_model(n_surface_verts=1200)
    for i in range(g["betas"].shape[0]):
        pose = g["pose"][i]
        out = S.smpl_forward(body, jnp.asarray(g["betas"][i]),
                             jnp.asarray(pose[3:]),
                             global_orient=jnp.asarray(pose[:3]))
        np.testing.assert_allclose(np.asarray(out.vertices[0]),
                                   g["verts"][i], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.joints[0]),
                                   g["joints"][i], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.A[0]),
                                   g["A"][i], atol=1e-5)


# ---------------------------------------------------------------- sampling

def test_grid_sample_matches_manual():
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.normal(size=(2, 4, 5, 6)).astype(np.float32))
    # exact voxel center: coord index (2, 1, 3) -> normalized
    W, H, D = 6, 5, 4
    c = np.array([[2 / (W - 1) * 2 - 1, 1 / (H - 1) * 2 - 1,
                   3 / (D - 1) * 2 - 1]], np.float32)
    out = np.asarray(B.grid_sample_3d(vox, jnp.asarray(c)))
    np.testing.assert_allclose(out[0], np.asarray(vox[:, 3, 1, 2]), rtol=1e-5)


def test_grid_sample_padding_modes():
    vox = jnp.ones((1, 4, 4, 4))
    far = jnp.asarray([[3.0, 0.0, 0.0]])   # fully outside: both corners OOB
    near = jnp.asarray([[1.1, 0.0, 0.0]])  # straddling the edge
    z = np.asarray(B.grid_sample_3d(vox, far, padding="zeros"))
    b = np.asarray(B.grid_sample_3d(vox, far, padding="border"))
    assert z[0, 0] == 0.0 and b[0, 0] == 1.0
    # zeros padding fades contributions at the boundary (torch semantics)
    zn = np.asarray(B.grid_sample_3d(vox, near, padding="zeros"))
    assert 0.0 < zn[0, 0] < 1.0


# ---------------------------------------------------------------- broyden

@pytest.fixture(scope="module")
def posed_setup(body):
    """Canonical statics + a posed frame for the synthetic body."""
    cano_pose = S.get_predefined_rest_pose("a_pose")
    out_c = S.smpl_forward(body, jnp.zeros(10), jnp.asarray(cano_pose))
    spec = LV.make_voxel_spec(np.asarray(out_c.vertices[0]), resolution=64)
    voxel_w = LV.make_weight_voxel(out_c.vertices[0],
                                   jnp.asarray(body.lbs_weights), spec)
    tfs_inv_t = jnp.linalg.inv(out_c.A[0])

    pose = np.zeros(69, np.float32)
    pose[2], pose[5] = 0.4, -0.4     # legs
    pose[(18 - 1) * 3 + 1] = 0.9     # left elbow
    pose[(17 - 1) * 3 + 2] = -0.5    # right shoulder
    out_p = S.smpl_forward(body, jnp.zeros(10), jnp.asarray(pose))
    w2s = jnp.linalg.inv(out_p.A[0, 0])
    tfs = jnp.einsum("ab,jbc,jcd->jad", w2s, out_p.A[0], tfs_inv_t)
    voxel_d, voxel_J = LV.precompute_transform_voxels(voxel_w, tfs, spec)
    voxel_J_packed = corner_pack(voxel_J.reshape(12, -1), spec.shape_dhw,
                                 "zeros")
    return dict(spec=spec, voxel_w=voxel_w, tfs=tfs,
                voxel_J_packed=voxel_J_packed, verts_cano=out_c.vertices[0])


def test_broyden_inverts_forward_skinning(posed_setup, rng):
    spec = posed_setup["spec"]
    tfs = posed_setup["tfs"]
    voxel_w = posed_setup["voxel_w"]
    # canonical query points: near-surface samples inside the grid
    vc = np.asarray(posed_setup["verts_cano"])
    sel = rng.choice(len(vc), 64, replace=False)
    xc0 = jnp.asarray(vc[sel])
    w = B.grid_sample_3d(voxel_w, spec.normalize(xc0), padding="border")
    xd, _ = B.forward_skinning(xc0, w, tfs)

    N = xd.shape[0]
    I = len(B.INIT_BONES)
    res = B.broyden_search(
        jnp.repeat(xd, I, axis=0), jnp.tile(jnp.asarray(B.INIT_BONES), N),
        posed_setup["voxel_J_packed"], tfs, jnp.asarray(spec.offset),
        jnp.asarray(spec.scale_kernel), shape_dhw=spec.shape_dhw,
    )
    valid = np.asarray(res.valid).reshape(N, I)
    xc = np.asarray(res.xc_array()).reshape(N, I, 3)
    assert valid.any(axis=1).mean() > 0.9, "most points should find a root"
    # every valid root must forward-skin back to the target
    vmask = valid.reshape(-1)
    wv = B.grid_sample_3d(voxel_w, spec.normalize(jnp.asarray(
        xc.reshape(-1, 3))), padding="border")
    xd_rt, _ = B.forward_skinning(jnp.asarray(xc.reshape(-1, 3)), wv, tfs)
    err = np.linalg.norm(np.asarray(xd_rt).reshape(N, I, 3)
                         - np.asarray(xd)[:, None], axis=-1).reshape(-1)
    assert np.median(err[vmask]) < 2e-4
    # and at least one root near the original canonical point for >80%
    d0 = np.linalg.norm(xc - np.asarray(xc0)[:, None], axis=-1)
    d0[~valid] = 1e9
    assert (d0.min(axis=1) < 5e-3).mean() > 0.8


def test_broyden_two_phase_matches_single_phase(posed_setup, rng):
    """The compacted two-phase schedule must reproduce the plain loop
    bit-exactly for every lane that fits the compaction budget."""
    spec = posed_setup["spec"]
    tfs = posed_setup["tfs"]
    vc = np.asarray(posed_setup["verts_cano"])
    # enough points that M = N*I crosses the two-phase threshold
    N = 8192
    sel = rng.choice(len(vc), N, replace=True)
    pts = jnp.asarray(vc[sel] + rng.normal(scale=0.02, size=(N, 3))
                      .astype(np.float32))
    w = B.grid_sample_3d(posed_setup["voxel_w"], spec.normalize(pts),
                         padding="border")
    xd, _ = B.forward_skinning(pts, w, tfs)
    I = len(B.INIT_BONES)
    args = (jnp.repeat(xd, I, axis=0), jnp.tile(jnp.asarray(B.INIT_BONES), N),
            posed_setup["voxel_J_packed"], tfs, jnp.asarray(spec.offset),
            jnp.asarray(spec.scale_kernel))
    kw = dict(shape_dhw=spec.shape_dhw)
    r1 = B.broyden_search(*args, **kw, two_phase=False)
    r2 = B.broyden_search(*args, **kw, two_phase=True)
    assert xd.shape[0] * I >= B._TWO_PHASE_MIN_M
    np.testing.assert_array_equal(np.asarray(r1.valid), np.asarray(r2.valid))
    for a, b in [(r1.x, r2.x), (r1.y, r2.y), (r1.z, r2.z),
                 *zip(r1.j_inv, r2.j_inv)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_filter_duplicates():
    xc = jnp.asarray([[[0.0, 0, 0], [0.0, 0, 0], [1.0, 0, 0]]])
    valid = jnp.asarray([[True, True, True]])
    out = np.asarray(B.filter_duplicates(xc, valid))
    # first candidate duplicated by the second -> dropped, keep the later
    np.testing.assert_array_equal(out[0], [False, True, True])


# ---------------------------------------------------------------- deformer

def make_rigid(body):
    cfg = wrap({
        "model_path": "synthetic",
        "deformer_config": {"resolution": 64, "cano_pose": "a_pose",
                            "global_scale": 1.2, "use_j_inv": False,
                            "optimize_betas": False, "max_candidates": 4},
    })
    d = FastSNARF(cfg)
    d.body_model = body
    return d


def frame_params(pose):
    z = jnp.zeros
    return {
        "betas": z(10), "body_pose": jnp.asarray(pose),
        "global_orient": z(3), "transl": jnp.asarray([0.0, 0.3, 2.0]),
        "betas_correction": z(10), "pose_correction": z(69),
        "global_orient_correction": z(3), "transl_correction": z(3),
    }


def test_fast_snarf_deform_sphere_geometry(body):
    d = make_rigid(body)
    statics = d.initialize(np.zeros(10))
    pose = np.zeros(69, np.float32)
    pose[(18 - 1) * 3 + 1] = 0.8
    frame = d.prepare(statics, frame_params(pose))

    # geometry: canonical sphere around the body center
    center = jnp.asarray((d.bbox[0] + d.bbox[1]) / 2)

    def geometry_fn(x):
        sdf = jnp.linalg.norm(x - center, axis=-1) - 0.4
        grad = (x - center) / jnp.maximum(
            jnp.linalg.norm(x - center, axis=-1, keepdims=True), 1e-6)
        eye = jnp.broadcast_to(jnp.eye(3), (*x.shape[:-1], 3, 3))
        return (sdf, grad, x), eye

    # query points: posed vertices (in SMPL space) + far-away points
    pts = jnp.concatenate([
        frame.vertices[:32],
        jnp.asarray([[5.0, 5.0, 5.0], [-4.0, 0.0, 0.0]]),
    ])
    out = d.deform(statics, frame, pts, geometry_fn, eval_mode=True)
    pts_cano, sdf, valid, grad_obs, grad_cano, feat = out
    valid = np.asarray(valid)
    assert valid[:32].mean() > 0.9
    assert not valid[-1] and not valid[-2]
    assert np.all(np.asarray(sdf)[~valid] >= 1e4)
    # gradients are unit-ish rotations of unit canonical grads
    g = np.asarray(grad_obs)[:32][valid[:32]]
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=0.2)


def test_fast_snarf_training_grad_flows_to_pose(body):
    d = make_rigid(body)
    statics = d.initialize(np.zeros(10))

    def loss_fn(pose_corr):
        p = frame_params(np.zeros(69, np.float32))
        p["pose_correction"] = pose_corr
        frame = d.prepare(statics, p)

        def geometry_fn(x):
            sdf = jnp.linalg.norm(x, axis=-1) - 0.4
            eye = jnp.broadcast_to(jnp.eye(3), (*x.shape[:-1], 3, 3))
            return (sdf,), eye

        pts = frame.vertices[:16]
        out = d.deform(statics, frame, pts, geometry_fn, eval_mode=False)
        return jnp.sum(out[1] * (np.asarray(out[2], float)))

    g = jax.grad(loss_fn)(jnp.zeros(69))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0, "IFT correction must carry pose grads"


# ---------------------------------------------------------------- pose

def test_pose_correction_gating():
    pc = PoseCorrection(wrap({"dataset_length": 5,
                              "enable_pose_correction": True,
                              "pose_correction_start_step": 100}))
    params = pc.init()
    params["pose"] = params["pose"].at[2, 0].set(0.5)
    off = pc(params, jnp.asarray([2]), global_step=50)
    on = pc(params, jnp.asarray([2]), global_step=200)
    assert float(off["pose_correction"][0, 0]) == 0.0
    assert float(on["pose_correction"][0, 0]) == 0.5


def test_pose_encoders():
    dummy = DummyPoseEncoder()
    out = dummy({}, jnp.zeros((1, 24, 9)), jnp.zeros((1, 24, 3)))
    assert out.shape == (1, 0)

    leap = HierarchicalPoseEncoder(wrap({"dim_per_joint": 6}))
    params = leap.init(jax.random.PRNGKey(0))
    rots = jnp.tile(jnp.eye(3).reshape(1, 1, 9), (2, 24, 1))
    joints = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24, 3)),
                         jnp.float32)
    feat = leap(params, rots, joints)
    assert feat.shape == (2, 24 * 6)
    assert np.all(np.isfinite(np.asarray(feat)))


def test_corner_packed_sampler_equivalence(rng):
    """Packed row-gather sampler == per-channel sampler, both paddings."""
    D, H, W, C = 8, 16, 16, 12
    vox = rng.normal(size=(C, D * H * W)).astype(np.float32)
    M = 5000
    cx = jnp.asarray(rng.uniform(-1.5, 1.5, M).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-1.5, 1.5, M).astype(np.float32))
    cz = jnp.asarray(rng.uniform(-1.5, 1.5, M).astype(np.float32))
    for padding in ("zeros", "border"):
        packed = corner_pack(jnp.asarray(vox), (D, H, W), padding)
        ref = B.grid_sample_channels(
            [jnp.asarray(vox[c]) for c in range(C)], (D, H, W),
            cx, cy, cz, padding)
        out = B.grid_sample_packed(packed, (D, H, W), C, cx, cy, cz, padding)
        for c in range(C):
            np.testing.assert_allclose(np.asarray(out[c]),
                                       np.asarray(ref[c]), atol=1e-6)


def test_seeded_polish_matches_search(body, rng):
    """Warm-started polish (deform_seeded) finds the same roots as the
    full n_init-way search for points one march step from their seeds —
    the secondary fine pass's contract (render/pbr.py seeding)."""
    d = make_rigid(body)
    statics = d.initialize(np.zeros(10))
    pose = np.zeros(69, np.float32)
    pose[(18 - 1) * 3 + 1] = 0.8
    pose[2], pose[5] = 0.3, -0.3
    frame = d.prepare(statics, frame_params(pose))

    center = jnp.asarray((d.bbox[0] + d.bbox[1]) / 2)

    def geometry_fn(x):
        sdf = jnp.linalg.norm(x - center, axis=-1) - 0.4
        grad = (x - center) / jnp.maximum(
            jnp.linalg.norm(x - center, axis=-1, keepdims=True), 1e-6)
        eye = jnp.broadcast_to(jnp.eye(3), (*x.shape[:-1], 3, 3))
        return (sdf, grad, x), eye

    # "coarse" points: posed near-surface samples; their full-search roots
    # become the seeds
    N = 256
    sel = rng.choice(frame.vertices.shape[0], N, replace=False)
    pts0 = jnp.asarray(np.asarray(frame.vertices)[sel])
    out0 = d.deform(statics, frame, pts0, geometry_fn, eval_mode=True)
    xc0, ok0 = out0[0], out0[2]

    # "fine" points: one secondary march step (~0.024) away
    delta = rng.normal(size=(N, 3)).astype(np.float32)
    delta /= np.linalg.norm(delta, axis=-1, keepdims=True)
    pts1 = pts0 + jnp.asarray(0.02 * delta)

    fresh = d.deform(statics, frame, pts1, geometry_fn, eval_mode=True)
    seeded = d.deform_seeded(statics, frame, pts1, xc0, ok0, geometry_fn)

    ok_f = np.asarray(fresh[2])
    ok_s = np.asarray(seeded[2])
    base = np.asarray(ok0)
    # the polish may only run where a seed exists
    assert not np.any(ok_s & ~base)
    # where a seed exists, the polish converges nearly as often as the
    # fresh search
    both_possible = base & ok_f
    assert (ok_s[both_possible].mean()) > 0.95
    # and lands on the same root / same SDF
    m = ok_s & ok_f
    xc_f = np.asarray(fresh[0])[m]
    xc_s = np.asarray(seeded[0])[m]
    d_root = np.linalg.norm(xc_f - xc_s, axis=-1)
    assert np.median(d_root) < 1e-4
    assert (d_root < 1e-3).mean() > 0.95
    np.testing.assert_allclose(np.asarray(seeded[1])[m],
                               np.asarray(fresh[1])[m], atol=1e-3)
    # gradient outputs agree too (same root branch, same rotation)
    g_f = np.asarray(fresh[3])[m]
    g_s = np.asarray(seeded[3])[m]
    close = d_root < 1e-3
    np.testing.assert_allclose(g_s[close], g_f[close], atol=1e-2)
