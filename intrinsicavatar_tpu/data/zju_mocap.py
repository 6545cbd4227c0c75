"""ZJU-MoCap multi-view dataset loader.

Equivalent of `datasets/zju_mocap.py` (taconite/IntrinsicAvatar): the index
set is the cross-product of cameras x frames; images are undistorted with
the per-camera distortion; masks carry a three-way label — 1 foreground
(eroded), 0 confident background (inside the dilated bound), 100 = ignore
(the erode/dilate boundary band, excluded from the mask loss); ``w2c`` is
included for normal-map evaluation; ``valid_mask`` is the dilated-bbox crop
used for metrics.
"""

from __future__ import annotations

import json
import os

import numpy as np

from intrinsicavatar_tpu.data import register
from intrinsicavatar_tpu.data.rays import make_rays, near_far_from_transl
from intrinsicavatar_tpu.data.samplers import make_sampler
from intrinsicavatar_tpu.data.peoplesnapshot import load_smpl_param


@register("zju-mocap")
class ZJUMoCapDataset:
    has_mask = True

    def __init__(self, config, split="train", mode="train", rng=None):
        import cv2  # noqa: F401 (used in __getitem__)

        self.config = config
        root = os.path.expanduser(config.get("dataroot", "."))
        self.root = root
        opt = config.get("opt", {}).get(mode, {})
        self.mode = mode
        self.downscale = opt.get("downscale", 1)
        self.kernel_size = opt.get("erode_kernel", 3)

        with open(os.path.join(root, "cameras.json")) as f:
            cameras = json.load(f)
        cam_names = opt.get("cameras", sorted(cameras.keys()))
        self.K, self.dist, self.w2c = {}, {}, {}
        for cam in cam_names:
            c = cameras[cam]
            K = np.asarray(c["K"], np.float32).reshape(3, 3)
            if self.downscale > 1:
                K = K.copy()
                K[:2] /= self.downscale
            self.K[cam] = K
            self.dist[cam] = np.asarray(c.get("dist", c.get("D", [0] * 5)),
                                        np.float32).reshape(-1)
            RT = np.eye(4, dtype=np.float32)
            RT[:3, :3] = np.asarray(c["R"], np.float32).reshape(3, 3)
            RT[:3, 3] = np.asarray(c["T"], np.float32).reshape(3)
            self.w2c[cam] = RT

        start, end, skip = opt.get("start", 0), opt.get("end", 0) + 1, \
            opt.get("skip", 1)
        frame_ids = list(range(start, end, skip))
        # cameras x frames cross product (reference KeyIndex, utils.py:1-36)
        self.items = [(cam, f) for cam in cam_names for f in frame_ids]
        self.frame_ids = frame_ids

        self.smpl_params = load_smpl_param(
            os.path.join(root, f"poses/anim_nerf_{split}.npz"))
        self.n_frames = len(frame_ids)
        self.betas_arr = self.smpl_params["betas"][0]
        self.sampler = (make_sampler(opt.get("sampler", {"name": "edge"}),
                                     rng=rng) if mode == "train" else None)

    def __len__(self):
        return len(self.items)

    @property
    def betas(self):
        return self.betas_arr

    def pose_batch(self, frame_pos):
        return {
            "index": np.asarray([frame_pos]),
            "betas": self.betas_arr,
            "body_pose": self.smpl_params["body_pose"][frame_pos],
            "global_orient": self.smpl_params["global_orient"][frame_pos],
            "transl": self.smpl_params["transl"][frame_pos],
        }

    def _three_way_mask(self, msk):
        """1=fg(eroded) / 0=bg(within bound) / 100=ignore band
        (`datasets/zju_mocap.py:189-243`)."""
        import cv2

        kernel = np.ones((self.kernel_size, self.kernel_size), np.uint8)
        m = (msk > 0).astype(np.uint8)
        m_erode = cv2.erode(m, kernel)
        m_dilate = cv2.dilate(m, kernel)
        bound = cv2.dilate(m, np.ones((32, 32), np.uint8))
        out = np.full(m.shape, 100, np.uint8)
        out[m_erode == 1] = 1
        out[(m_erode == 0) & (bound == 1)] = 0
        out[(m_dilate - m_erode) == 1] = 100
        return out, m_dilate

    def __getitem__(self, idx):
        import cv2

        cam, frame = self.items[idx]
        frame_pos = self.frame_ids.index(frame)
        img_path = os.path.join(self.root, cam, f"{frame:06d}.jpg")
        if not os.path.exists(img_path):
            img_path = os.path.join(self.root, cam, f"{frame:06d}.png")
        msk_path = os.path.join(self.root, f"{cam}_mask",
                                f"{frame:06d}.png")
        img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        msk = cv2.imread(msk_path, cv2.IMREAD_GRAYSCALE)
        img = cv2.undistort(img, self.K[cam] * (self.downscale if
                            self.downscale > 1 else 1), self.dist[cam])
        msk = cv2.undistort(msk, self.K[cam] * (self.downscale if
                            self.downscale > 1 else 1), self.dist[cam])
        if self.downscale > 1:
            img = cv2.resize(img, dsize=None, fx=1 / self.downscale,
                             fy=1 / self.downscale)
            msk = cv2.resize(msk, dsize=None, fx=1 / self.downscale,
                             fy=1 / self.downscale)
        img = (img[..., :3] / 255.0).astype(np.float32)
        mask3, m_dilate = self._three_way_mask(msk)

        # metric crop bbox from the dilated mask
        ys, xs = np.where(m_dilate > 0)
        valid = np.zeros(m_dilate.shape, bool)
        if len(ys):
            valid[ys.min():ys.max() + 1, xs.min():xs.max() + 1] = True

        H, W = img.shape[:2]
        c2w = np.linalg.inv(self.w2c[cam]).astype(np.float32)
        rays_o, rays_d = make_rays(self.K[cam], c2w, H, W)

        mask3 = mask3.astype(np.float32)
        if self.sampler is not None:
            m, img_s, valid_s, ro, rd = self.sampler.sample(
                (mask3 == 1).astype(np.float32), img,
                valid.astype(np.float32), rays_o, rays_d)
            mask3, img, valid = m, img_s, valid_s[:, 0] > 0
            rays_o, rays_d = ro, rd
        else:
            rays_o = rays_o.reshape(-1, 3)
            rays_d = rays_d.reshape(-1, 3)
            img = img.reshape(-1, 3)
            mask3 = mask3.reshape(-1)
            valid = valid.reshape(-1)

        near, far = near_far_from_transl(
            self.smpl_params["transl"][frame_pos] - c2w[:3, 3], len(rays_d))
        rays = np.concatenate([rays_o, rays_d, near[:, None], far[:, None]],
                              -1).astype(np.float32)
        return {
            "rays": rays,
            "rgb": img,
            "alpha": mask3,
            "valid_mask": valid,
            "w2c": self.w2c[cam],
            **self.pose_batch(frame_pos),
            "t_idx": frame_pos / self.n_frames,
        }
