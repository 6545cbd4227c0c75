"""Convert raw ZJU-MoCap captures into the loader layout.

Equivalent of `scripts/preprocess_ZJU-MoCap.py` (taconite/IntrinsicAvatar):
writes per-camera undistort-ready ``cameras.json`` (K/R/T/dist per camera),
per-camera image/mask directories and the refined SMPL pose cache
``poses/anim_nerf_{split}.npz``.

    python scripts/preprocess_zju_mocap.py --root <CoreView_xxx> \
        --out ./load/zju/CoreView_xxx --cameras "Camera (1)" ...
"""

import argparse
import glob
import json
import os

import numpy as np


def main():
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--cameras", nargs="*", default=None)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=-1)
    p.add_argument("--skip", type=int, default=1)
    args = p.parse_args()

    annots = np.load(os.path.join(args.root, "annots.npy"),
                     allow_pickle=True).item()
    cams = annots["cams"]
    cam_names = args.cameras or [f"Camera_B{i+1}"
                                 for i in range(len(cams["K"]))]
    os.makedirs(args.out, exist_ok=True)

    cam_params = {}
    for i, name in enumerate(cam_names):
        cam_params[name] = {
            "K": np.asarray(cams["K"][i]).reshape(3, 3).tolist(),
            "R": np.asarray(cams["R"][i]).reshape(3, 3).tolist(),
            "T": (np.asarray(cams["T"][i]).reshape(3) / 1000.0).tolist(),
            "dist": np.asarray(cams["D"][i]).reshape(-1).tolist(),
        }
    with open(os.path.join(args.out, "cameras.json"), "w") as f:
        json.dump(cam_params, f)

    for name in cam_names:
        img_dir = os.path.join(args.out, name)
        msk_dir = os.path.join(args.out, f"{name}_mask")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(msk_dir, exist_ok=True)
        imgs = sorted(glob.glob(os.path.join(args.root, name, "*.jpg")))
        end = args.end if args.end > 0 else len(imgs)
        for j, src in enumerate(imgs[args.start:end:args.skip]):
            frame = args.start + j * args.skip
            img = cv2.imread(src)
            cv2.imwrite(os.path.join(img_dir, f"{frame:06d}.jpg"), img)
            mpath = src.replace(name, os.path.join("mask", name)) \
                .replace(".jpg", ".png")
            if os.path.exists(mpath):
                msk = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
                cv2.imwrite(os.path.join(msk_dir, f"{frame:06d}.png"), msk)

    # SMPL parameters from the EasyMocap-style params directory
    params_dir = os.path.join(args.root, "new_params")
    if not os.path.isdir(params_dir):
        params_dir = os.path.join(args.root, "params")
    files = sorted(glob.glob(os.path.join(params_dir, "*.npy")))
    poses, orients, transls, betas = [], [], [], None
    end = args.end if args.end > 0 else len(files)
    for f_ in files[args.start:end:args.skip]:
        d = np.load(f_, allow_pickle=True).item()
        ps = np.asarray(d["poses"]).reshape(-1)
        orients.append(ps[:3])
        poses.append(ps[3:72])
        transls.append(np.asarray(d["Th"]).reshape(3))
        betas = np.asarray(d["shapes"]).reshape(-1)[:10]
    os.makedirs(os.path.join(args.out, "poses"), exist_ok=True)
    np.savez(os.path.join(args.out, "poses", "anim_nerf_train.npz"),
             betas=betas.reshape(1, 10).astype(np.float32),
             body_pose=np.stack(poses).astype(np.float32),
             global_orient=np.stack(orients).astype(np.float32),
             transl=np.stack(transls).astype(np.float32))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
