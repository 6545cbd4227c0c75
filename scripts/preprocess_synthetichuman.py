"""Convert SyntheticHuman(++) sequences into the loader layout.

Equivalent of `scripts/preprocess_SyntheticHuman.py` /
`preprocess_SyntheticHuman++.py` (taconite/IntrinsicAvatar): per-camera
images/masks, GT albedo (linear, from EXR) and normal PNGs, ``cameras.npz``,
SMPL pose caches.

    python scripts/preprocess_synthetichuman.py --root <seq> --out ./load/sh/<seq> \
        --camera 00
"""

import argparse
import glob
import json
import os

import numpy as np


def _read_exr(path):
    import imageio.v2 as imageio

    try:
        return np.asarray(imageio.imread(path), np.float32)
    except Exception:
        import cv2

        return cv2.cvtColor(
            cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB).astype(np.float32)


def main():
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--camera", default="00")
    args = p.parse_args()

    out = args.out
    for sub in ("images", "masks", "albedo", "normal", "poses"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    ann_path = os.path.join(args.root, "annots.npy")
    annots = np.load(ann_path, allow_pickle=True).item()
    cam_idx = int(args.camera)
    cams = annots["cams"]
    K = np.asarray(cams["K"][cam_idx], np.float32).reshape(3, 3)
    R = np.asarray(cams["R"][cam_idx], np.float32).reshape(3, 3)
    T = np.asarray(cams["T"][cam_idx], np.float32).reshape(3)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = T

    imgs = sorted(glob.glob(os.path.join(args.root, "images", args.camera,
                                         "*.png")))
    H = W = None
    for i, src in enumerate(imgs):
        img = cv2.imread(src)
        H, W = img.shape[:2]
        cv2.imwrite(os.path.join(out, "images", f"image_{i:04d}.png"), img)
        mpath = src.replace("images", "masks")
        if os.path.exists(mpath):
            m = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
            np.save(os.path.join(out, "masks", f"mask_{i:04d}.npy"),
                    (m > 127).astype(np.uint8))
        apath = os.path.join(args.root, "albedos", args.camera,
                             f"albedo_0001_{i:04d}.exr")
        if os.path.exists(apath):
            alb = np.clip(_read_exr(apath), 0, 1)
            cv2.imwrite(os.path.join(out, "albedo", f"albedo_{i:04d}.png"),
                        cv2.cvtColor((alb * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
        npath = os.path.join(args.root, "normals", args.camera,
                             f"normal_{i:04d}.png")
        if os.path.exists(npath):
            cv2.imwrite(os.path.join(out, "normal", f"normal_{i:04d}.png"),
                        cv2.imread(npath))

    np.savez(os.path.join(out, "cameras.npz"), intrinsic=K, extrinsic=w2c,
             height=H, width=W)

    # SMPL parameters
    param_files = sorted(glob.glob(os.path.join(args.root, "params",
                                                "*.npy")))
    poses, orients, transls, betas = [], [], [], None
    for f_ in param_files:
        d = np.load(f_, allow_pickle=True).item()
        ps = np.asarray(d["poses"], np.float32).reshape(-1)
        orients.append(ps[:3])
        poses.append(ps[3:72])
        transls.append(np.asarray(d.get("Th", d.get("transl")),
                                  np.float32).reshape(3))
        if betas is None:
            betas = np.asarray(d.get("shapes", d.get("betas")),
                               np.float32).reshape(-1)[:10]
    np.savez(os.path.join(out, "poses", "anim_nerf_train.npz"),
             betas=betas.reshape(1, 10), body_pose=np.stack(poses),
             global_orient=np.stack(orients), transl=np.stack(transls))
    print("wrote", out)


if __name__ == "__main__":
    main()
