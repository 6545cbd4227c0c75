"""Data-layer tests on fabricated on-disk layouts.

Covers the loaders of `datasets/*.py` (taconite/IntrinsicAvatar): batch
contract keys (SURVEY.md Appendix A), ray generation, edge sampling, the
ZJU three-way mask labels, and the GT-extras path of SyntheticHuman/RANA.
"""

import json
import os

import numpy as np
import pytest

from intrinsicavatar_tpu.utils.config import wrap

cv2 = pytest.importorskip("cv2")

H, W = 64, 48
N_FRAMES = 3


def _camera_npz(path):
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 80.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    np.savez(path, intrinsic=K, extrinsic=np.eye(4, dtype=np.float32),
             height=H, width=W)
    return K


def _poses_npz(path, n=N_FRAMES):
    np.savez(path,
             betas=np.zeros((1, 10), np.float32),
             body_pose=np.zeros((n, 69), np.float32),
             global_orient=np.zeros((n, 3), np.float32),
             transl=np.tile(np.array([0.0, 0.3, 2.0], np.float32), (n, 1)))


def _disc_mask():
    """A centered disc: guarantees fg, edge band, and bg pixels."""
    yy, xx = np.mgrid[:H, :W]
    return ((yy - H / 2) ** 2 + (xx - W / 2) ** 2 < (H / 4) ** 2)


def _write_frames(root, mask_as="npy"):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    m = _disc_mask()
    img = np.full((H, W, 3), 128, np.uint8)
    img[m] = (200, 90, 40)
    for i in range(N_FRAMES):
        cv2.imwrite(os.path.join(root, "images", f"{i:04d}.png"),
                    img[..., ::-1])
        np.save(os.path.join(root, "masks", f"{i:04d}.npy"),
                m.astype(np.float32))
    return m


def _peoplesnapshot_root(tmp_path):
    root = str(tmp_path / "ps")
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    _camera_npz(os.path.join(root, "cameras.npz"))
    _poses_npz(os.path.join(root, "poses", "anim_nerf_train.npz"))
    _poses_npz(os.path.join(root, "poses", "anim_nerf_val.npz"))
    _write_frames(root)
    return root


def _opt(**kw):
    base = {"start": 0, "end": N_FRAMES - 1, "skip": 1, "downscale": 1}
    base.update(kw)
    return base


def test_peoplesnapshot_train_and_val(tmp_path):
    from intrinsicavatar_tpu.data.peoplesnapshot import PeopleSnapshotDataset

    root = _peoplesnapshot_root(tmp_path)
    cfg = wrap({"dataroot": root, "opt": {
        "train": _opt(sampler={"name": "edge", "num_sample": 256,
                               "ratio_mask": 0.6, "ratio_edge": 0.3,
                               "kernel_size": 4}),
        "val": _opt(),
    }})
    ds = PeopleSnapshotDataset(cfg, split="train", mode="train",
                               rng=np.random.default_rng(0))
    assert len(ds) == N_FRAMES
    d = ds[0]
    assert d["rays"].shape == (256, 8)
    # ray dirs normalized; near/far bracket the SMPL translation distance
    np.testing.assert_allclose(np.linalg.norm(d["rays"][:, 3:6], axis=-1),
                               1.0, atol=1e-5)
    dist = np.linalg.norm([0.0, 0.3, 2.0])
    assert d["rays"][:, 6].min() >= 0.0
    assert abs(d["rays"][:, 7].mean() - (dist + 1.0)) < 1e-3
    assert d["rgb"].shape == (256, 3) and d["alpha"].shape == (256,)
    # edge sampler: >=60% of rays on the fg mask
    assert d["alpha"].mean() >= 0.55
    assert d["body_pose"].shape == (69,) and d["betas"].shape == (10,)
    assert 0.0 <= d["t_idx"] < 1.0

    val = PeopleSnapshotDataset(cfg, split="val", mode="val")
    dv = val[1]
    assert dv["rays"].shape == (H * W, 8)
    assert val.img_wh == (W, H)

    # train_iter yields jax batches without t_idx inside
    batch, t_idx = next(ds.train_iter(np.random.default_rng(1)))
    assert "t_idx" not in batch and batch["rays"].shape == (256, 8)


def test_peoplesnapshot_trains_end_to_end(tmp_path):
    """The real-data path (images + masks + SMPL poses from disk) drives
    the training system, not just the loader: two descending steps on a
    fabricated PeopleSnapshot layout (the committed runs use the synthetic
    capsule loader, so this is the image-loader -> fit contract check)."""
    import jax
    from intrinsicavatar_tpu.data.peoplesnapshot import PeopleSnapshotDataset
    from intrinsicavatar_tpu.train.system import IntrinsicAvatarSystem
    from intrinsicavatar_tpu.utils.default_config import tiny_config

    root = _peoplesnapshot_root(tmp_path)
    dcfg = wrap({"dataroot": root, "opt": {
        "train": _opt(sampler={"name": "edge", "num_sample": 128,
                               "ratio_mask": 0.6, "ratio_edge": 0.3,
                               "kernel_size": 4}),
        "val": _opt(),
    }})
    ds = PeopleSnapshotDataset(dcfg, split="train", mode="train",
                               rng=np.random.default_rng(0))
    cfg = tiny_config()
    sys_ = IntrinsicAvatarSystem(cfg)
    state = sys_.setup(ds.betas, jax.random.PRNGKey(0), n_frames=len(ds))
    state, history = sys_.fit(ds.train_iter(np.random.default_rng(1)),
                              state, 2, log_every=1, prefetch=False)
    assert int(state.step) == 2
    losses = dict(history[-1][1])
    assert np.isfinite(losses["total"])


def test_zju_mocap_multicam(tmp_path):
    from intrinsicavatar_tpu.data.zju_mocap import ZJUMoCapDataset

    root = str(tmp_path / "zju")
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    m = _disc_mask()
    img = np.full((H, W, 3), 90, np.uint8)
    img[m] = (10, 220, 10)
    cams = {}
    for cam in ("01", "02"):
        os.makedirs(os.path.join(root, cam), exist_ok=True)
        os.makedirs(os.path.join(root, f"{cam}_mask"), exist_ok=True)
        for f in range(N_FRAMES):
            cv2.imwrite(os.path.join(root, cam, f"{f:06d}.jpg"),
                        img[..., ::-1])
            cv2.imwrite(os.path.join(root, f"{cam}_mask", f"{f:06d}.png"),
                        (m * 255).astype(np.uint8))
        K = np.eye(3)
        K[0, 0] = K[1, 1] = 80.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        cams[cam] = {"K": K.tolist(), "R": np.eye(3).tolist(),
                     "T": [0.0, 0.0, 0.0], "dist": [0.0] * 5}
    with open(os.path.join(root, "cameras.json"), "w") as f:
        json.dump(cams, f)
    _poses_npz(os.path.join(root, "poses", "anim_nerf_train.npz"))

    cfg = wrap({"dataroot": root, "opt": {"test": _opt()}})
    ds = ZJUMoCapDataset(cfg, split="train", mode="test")
    # cameras x frames cross product (reference KeyIndex)
    assert len(ds) == 2 * N_FRAMES
    d = ds[0]
    labels = set(np.unique(d["alpha"]).astype(int).tolist())
    assert labels <= {0, 1, 100} and {1, 100} <= labels
    assert d["w2c"].shape == (4, 4)
    assert d["valid_mask"].shape == (H * W,) and d["valid_mask"].any()


def test_synthetichuman_gt_extras(tmp_path):
    from intrinsicavatar_tpu.data.synthetichuman import SyntheticHumanDataset

    root = _peoplesnapshot_root(tmp_path.joinpath("sh"))
    os.makedirs(os.path.join(root, "albedo"), exist_ok=True)
    os.makedirs(os.path.join(root, "normal"), exist_ok=True)
    alb = np.full((H, W, 3), 180, np.uint8)
    nrm = np.full((H, W, 3), 255, np.uint8)  # -> unit +x+y+z/sqrt3 normals
    for i in range(N_FRAMES):
        cv2.imwrite(os.path.join(root, "albedo", f"{i:04d}.png"),
                    alb[..., ::-1])
        cv2.imwrite(os.path.join(root, "normal", f"{i:04d}.png"),
                    nrm[..., ::-1])

    cfg = wrap({"dataroot": root, "opt": {"val": _opt()}})
    ds = SyntheticHumanDataset(cfg, split="val", mode="val")
    d = ds[0]
    assert d["albedo"].shape == (H * W, 3)
    np.testing.assert_allclose(d["albedo"][0], 180 / 255.0, atol=1e-3)
    assert d["normal"].shape == (H * W, 3)
    np.testing.assert_allclose(d["normal"][0], 1.0, atol=1e-2)
    assert d["valid_mask"].shape == (H * W,)
    # valid bbox covers the disc and excludes the border
    assert d["valid_mask"].sum() > m_area() / 2
    assert not d["valid_mask"].reshape(H, W)[0, 0]


def m_area():
    return int(_disc_mask().sum())


def test_rana_is_synthetichuman_protocol(tmp_path):
    from intrinsicavatar_tpu.data.synthetichuman import RanaDataset

    root = _peoplesnapshot_root(tmp_path.joinpath("rana"))
    cfg = wrap({"dataroot": root, "opt": {"val": _opt()}})
    ds = RanaDataset(cfg, split="val", mode="val")
    assert len(ds) == N_FRAMES
    assert ds[0]["rays"].shape == (H * W, 8)


def test_animation_poses_only(tmp_path):
    from intrinsicavatar_tpu.data.animation import AnimationDataset

    root = str(tmp_path / "anim")
    os.makedirs(root, exist_ok=True)
    n = 4
    np.savez(os.path.join(root, "cameras.npz"),
             height=np.full(n, 128), width=np.full(n, 128),
             intrinsic=np.stack([np.eye(3)] * n),
             extrinsic=np.stack([np.eye(4)] * n))
    np.savez(os.path.join(root, "poses.npz"),
             thetas=np.zeros((n, 72), np.float32),
             transl=np.tile(np.array([0, 0.3, 5.0], np.float32), (n, 1)),
             betas=np.zeros(10, np.float32))
    cfg = wrap({"dataroot": root,
                "opt": {"predict": {"start": 0, "end": -1, "skip": 1,
                                    "downscale": 2}}})
    ds = AnimationDataset(cfg, betas=np.zeros(10, np.float32))
    assert len(ds) == n
    d = ds[0]
    assert d["rays"].shape == (64 * 64, 8)
    assert "rgb" not in d  # poses only: no image supervision
    assert d["betas"].shape == (10,)
