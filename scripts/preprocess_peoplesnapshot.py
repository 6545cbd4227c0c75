"""Convert raw PeopleSnapshot captures into the loader layout.

Equivalent of `scripts/preprocess_PeopleSnapshot.py` (taconite/
IntrinsicAvatar): undistorts video frames and masks, writes
``cameras.npz`` (intrinsic/extrinsic/height/width), ``images/*.png``,
``masks/*.npy`` and ``poses.npz`` (betas/thetas/transl from the
reconstructed_poses hdf5).

    python scripts/preprocess_peoplesnapshot.py --root <PeopleSnapshotData> \
        --subject male-3-casual [--out ./load/peoplesnapshot]
"""

import argparse
import os
import pickle
from pathlib import Path

import numpy as np


def main():
    import cv2
    import h5py

    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True,
                        help="path to the raw PeopleSnapshotData")
    parser.add_argument("--subject", default="male-3-casual")
    parser.add_argument("--out", default="./load/peoplesnapshot")
    args = parser.parse_args()

    src = Path(args.root) / args.subject
    assert src.exists(), f"cannot open {src}"
    out = Path(args.out) / args.subject
    out.mkdir(parents=True, exist_ok=True)

    with open(src / "camera.pkl", "rb") as f:
        camera = pickle.load(f, encoding="latin")
    K = np.eye(3)
    K[0, 0], K[1, 1] = camera["camera_f"]
    K[:2, 2] = camera["camera_c"]
    dist = camera["camera_k"]
    w2c = np.eye(4)
    w2c[:3, :3] = cv2.Rodrigues(camera["camera_rt"])[0]
    w2c[:3, 3] = camera["camera_t"]
    np.savez(out / "cameras.npz", intrinsic=K, extrinsic=w2c,
             height=camera["height"], width=camera["width"])
    print("wrote", out / "cameras.npz")

    img_dir = out / "images"
    img_dir.mkdir(exist_ok=True)
    cap = cv2.VideoCapture(str(src / f"{args.subject}.mp4"))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    for i in range(n):
        ok, frame = cap.read()
        if not ok:
            break
        cv2.imwrite(str(img_dir / f"image_{i:04d}.png"),
                    cv2.undistort(frame, K, dist))
    print(f"wrote {n} frames to", img_dir)

    msk_dir = out / "masks"
    msk_dir.mkdir(exist_ok=True)
    with h5py.File(src / "masks.hdf5", "r") as f:
        masks = np.asarray(f["masks"]).astype(np.uint8)
    for i, m in enumerate(masks):
        np.save(msk_dir / f"mask_{i:04d}.npy", cv2.undistort(m, K, dist))
    print(f"wrote {len(masks)} masks to", msk_dir)

    with h5py.File(src / "reconstructed_poses.hdf5", "r") as f:
        np.savez(out / "poses.npz",
                 betas=np.asarray(f["betas"], np.float32),
                 thetas=np.asarray(f["pose"], np.float32),
                 transl=np.asarray(f["trans"], np.float32))
    print("wrote", out / "poses.npz")


if __name__ == "__main__":
    main()
