"""Convert the RANA synthetic benchmark into the loader layout.

Equivalent of `scripts/preprocess_RANA.py` (taconite/IntrinsicAvatar):
images + masks + GT albedo/normal pngs, ``cameras.npz``, SMPL pose caches,
and ``hdri_files.json`` for relighting evaluation.  Each RANA frame carries
a JSON annotation with camera intrinsics, SMPL params, and the HDRI url;
HDRIs are downloaded into ``hdri/`` when network access exists (pass
``--no-download`` otherwise and place them manually).

    python scripts/preprocess_rana.py --root <RANA/subject> --out ./load/rana/<subject>
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
    p.add_argument("--no-download", action="store_true")
    args = p.parse_args()

    out = args.out
    for sub in ("images", "masks", "albedo", "normal", "hdri", "poses"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    frames = sorted(glob.glob(os.path.join(args.root, "frame_*.json")))
    poses, orients, transls = [], [], []
    betas = None
    hdri_files = []
    K = None
    for i, jf in enumerate(frames):
        with open(jf) as f:
            ann = json.load(f)
        base = os.path.splitext(os.path.basename(jf))[0]
        K = np.asarray(ann["camera"]["K"], np.float32).reshape(3, 3) \
            if "camera" in ann else K
        img = cv2.imread(os.path.join(args.root, base + ".png"),
                         cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        if img.shape[-1] == 4:
            mask = (img[..., 3] > 127).astype(np.uint8)
            rgb = img[..., :3]
        else:
            rgb = img
            mask = np.ones(img.shape[:2], np.uint8)
        cv2.imwrite(os.path.join(out, "images", f"image_{i:04d}.png"), rgb)
        np.save(os.path.join(out, "masks", f"mask_{i:04d}.npy"), mask)
        for kind in ("albedo", "normal"):
            src = os.path.join(args.root, f"{base}_{kind}.png")
            if os.path.exists(src):
                cv2.imwrite(os.path.join(out, kind, f"{kind}_{i:04d}.png"),
                            cv2.imread(src))
        smpl = ann.get("smpl", ann)
        pose = np.asarray(smpl["poses" if "poses" in smpl else "body_pose"],
                          np.float32).reshape(-1)
        if pose.shape[0] >= 72:
            orients.append(pose[:3])
            poses.append(pose[3:72])
        else:
            orients.append(np.asarray(smpl["global_orient"],
                                      np.float32).reshape(3))
            poses.append(pose[:69])
        transls.append(np.asarray(smpl.get("transl", smpl.get("Th")),
                                  np.float32).reshape(3))
        if betas is None:
            betas = np.asarray(smpl.get("betas", smpl.get("shapes")),
                               np.float32).reshape(-1)[:10]
        url = ann.get("hdri_url") or ann.get("hdri")
        if url:
            name = os.path.basename(url)
            hdri_files.append(name)
            dst = os.path.join(out, "hdri", name)
            if not args.no_download and not os.path.exists(dst):
                os.system(f"wget -q {url} -P {os.path.join(out, 'hdri')}")

    if K is not None:
        np.savez(os.path.join(out, "cameras.npz"), intrinsic=K,
                 extrinsic=np.eye(4), height=rgb.shape[0], width=rgb.shape[1])
    np.savez(os.path.join(out, "poses", "anim_nerf_train.npz"),
             betas=betas.reshape(1, 10),
             body_pose=np.stack(poses), global_orient=np.stack(orients),
             transl=np.stack(transls))
    if hdri_files:
        with open(os.path.join(out, "hdri_files.json"), "w") as f:
            json.dump(hdri_files, f)
    print("wrote", out)


if __name__ == "__main__":
    main()
