"""PeopleSnapshot dataset loader.

Equivalent of `datasets/peoplesnapshot.py` (taconite/IntrinsicAvatar):
per-frame pinhole rays, SMPL parameters from the AnimNeRF-refined pose
caches, foreground masks, ``t_idx = idx / n_frames`` for the temporal
occupancy grid, near/far from the camera-to-pelvis distance.

Layout on disk (produced by ``scripts/preprocess_peoplesnapshot.py``)::

    <root>/cameras.npz          intrinsic, extrinsic, height, width
    <root>/images/*.png
    <root>/masks/*.npy
    <root>/poses/anim_nerf_{split}.npz   (betas/body_pose/global_orient/transl)
"""

from __future__ import annotations

import glob
import os

import numpy as np

from intrinsicavatar_tpu.data import register
from intrinsicavatar_tpu.data.rays import make_rays, near_far_from_transl
from intrinsicavatar_tpu.data.samplers import make_sampler


def load_smpl_param(path):
    """Read an .npz of SMPL parameters into the framework's batch keys.

    Accepts either split axis-angle keys (``body_pose``/``global_orient``)
    or the packed 72-dim ``thetas`` form some pose caches use (root
    orientation in the first 3 components) — the semantics of the
    reference's pose-cache reader (`datasets/peoplesnapshot.py:36-47`).
    """
    raw = np.load(str(path))
    out = {"betas": np.reshape(raw["betas"], (1, 10)).astype(np.float32),
           "transl": raw["transl"].astype(np.float32)}
    if "thetas" in raw.files:
        packed = raw["thetas"].astype(np.float32)
        out["global_orient"], out["body_pose"] = np.split(packed, [3], -1)
    else:
        out["global_orient"] = raw["global_orient"].astype(np.float32)
        out["body_pose"] = raw["body_pose"].astype(np.float32)
    return out


@register("peoplesnapshot")
class PeopleSnapshotDataset:
    """One split of a PeopleSnapshot subject.

    ``config`` carries dataroot/subject + per-split opt (start/end/skip/
    downscale/sampler).  ``mode`` in {train, val, test}.
    """

    has_mask = True

    def __init__(self, config, split="train", mode="train", rng=None):
        self.config = config
        self.mode = mode
        root = config.get("dataroot", "./load/peoplesnapshot/") \
            .replace("${dataset.subject}", config.get("subject", ""))
        root = os.path.expanduser(root)
        self.root = root
        opt = config.get("opt", {}).get(mode if mode != "val" else "val",
                                        {})
        camera = np.load(os.path.join(root, "cameras.npz"))
        K = camera["intrinsic"].astype(np.float32).copy()
        c2w = np.linalg.inv(camera["extrinsic"]).astype(np.float32)
        H, W = int(camera["height"]), int(camera["width"])
        self.downscale = opt.get("downscale", 1)
        if self.downscale > 1:
            H, W = int(H / self.downscale), int(W / self.downscale)
            K[:2] /= self.downscale
        self.img_wh = (W, H)
        self.rays_o, self.rays_d = make_rays(K, c2w, H, W)

        start, end, skip = opt.get("start", 0), opt.get("end", 0) + 1, \
            opt.get("skip", 1)
        self.img_lists = sorted(glob.glob(f"{root}/images/*.png"))[
            start:end:skip]
        self.msk_lists = sorted(glob.glob(f"{root}/masks/*.npy"))[
            start:end:skip]

        cached = os.path.join(root, f"poses/anim_nerf_{split}.npz")
        if not os.path.exists(cached):
            cached = os.path.join(root, f"poses/{split}.npz")
        if os.path.exists(cached):
            self.smpl_params = load_smpl_param(cached)
        else:
            self.smpl_params = load_smpl_param(os.path.join(root, "poses.npz"))
            for k, v in self.smpl_params.items():
                if k != "betas":
                    self.smpl_params[k] = v[start:end:skip]

        self.n_frames = max(len(self.img_lists),
                            len(self.smpl_params["body_pose"]))
        self.sampler = (make_sampler(opt.get("sampler",
                                             {"name": "edge"}), rng=rng)
                        if mode == "train" else None)
        self.hdri_filepath = config.get("hdri_filepath", None)

    def __len__(self):
        return self.n_frames

    @property
    def betas(self):
        return self.smpl_params["betas"][0]

    def pose_batch(self, idx):
        """SMPL-only batch (used for occupancy re-init and animation)."""
        return {
            "index": np.asarray([idx]),
            "betas": self.smpl_params["betas"][0],
            "body_pose": self.smpl_params["body_pose"][idx],
            "global_orient": self.smpl_params["global_orient"][idx],
            "transl": self.smpl_params["transl"][idx],
        }

    def __getitem__(self, idx):
        import cv2

        img = cv2.cvtColor(cv2.imread(self.img_lists[idx]), cv2.COLOR_BGR2RGB)
        msk = np.load(self.msk_lists[idx])
        if self.downscale > 1:
            img = cv2.resize(img, dsize=None, fx=1 / self.downscale,
                             fy=1 / self.downscale)
            msk = cv2.resize(msk, dsize=None, fx=1 / self.downscale,
                             fy=1 / self.downscale)
        img = (img[..., :3] / 255.0).astype(np.float32)
        msk = msk.astype(np.float32)

        if self.sampler is not None:
            msk, img, rays_o, rays_d = self.sampler.sample(
                msk, img, self.rays_o, self.rays_d)
        else:
            rays_o = self.rays_o.reshape(-1, 3)
            rays_d = self.rays_d.reshape(-1, 3)
            img = img.reshape(-1, 3)
            msk = msk.reshape(-1)

        near, far = near_far_from_transl(
            self.smpl_params["transl"][idx], len(rays_d))
        rays = np.concatenate(
            [rays_o, rays_d, near[:, None], far[:, None]], -1)
        datum = {
            "rays": rays.astype(np.float32),
            "rgb": img,
            "alpha": msk,
            **self.pose_batch(idx),
            "t_idx": idx / self.n_frames,
        }
        if self.mode == "test" and self.hdri_filepath:
            hdri = cv2.cvtColor(
                cv2.imread(self.hdri_filepath,
                           cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR),
                cv2.COLOR_BGR2RGB)
            datum["hdri"] = hdri.astype(np.float32)
        return datum

    def train_iter(self, rng=None):
        """Infinite (batch, t_idx) iterator over random frames."""
        import jax.numpy as jnp
        rng = rng or np.random.default_rng(0)
        while True:
            idx = int(rng.integers(0, len(self)))
            d = self[idx]
            t_idx = d.pop("t_idx")
            yield {k: jnp.asarray(v) for k, v in d.items()}, t_idx
