"""Convert CAPE motion sequences into the animation loader layout.

Equivalent of `scripts/preprocess_CAPE.py` (taconite/IntrinsicAvatar):
drives an avatar trained on one subject (shape betas from its
PeopleSnapshot pose cache) with the motion of a CAPE sequence.  Per frame
the CAPE npz carries a 72-d axis-angle ``pose`` and a ``transl``; the raw
capture is upside-down relative to our camera convention, so the root
orientation is rotated 180 degrees about x, and hand/feet joints are zeroed
(CAPE's are unreliable).  Writes ``poses.npz`` (thetas/transl/betas) and
``cameras.npz`` (per-frame intrinsic/extrinsic, f=2000 synthetic pinhole),
optionally appending a 50-frame 360-degree turntable of the last pose.

    python scripts/preprocess_cape.py --data-dir <CAPE> \
        --src-subj male-3-casual --tgt-subj 00032 --seq shortlong_soccer \
        --out ./load/animation
"""

import argparse
import glob
import os

import numpy as np


def _rotvec_to_mat(rv):
    """Axis-angle [N,3] -> rotation matrices [N,3,3] (Rodrigues)."""
    theta = np.linalg.norm(rv, axis=-1, keepdims=True)
    axis = rv / np.maximum(theta, 1e-12)
    K = np.zeros(rv.shape[:-1] + (3, 3), rv.dtype)
    K[..., 0, 1], K[..., 0, 2] = -axis[..., 2], axis[..., 1]
    K[..., 1, 0], K[..., 1, 2] = axis[..., 2], -axis[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -axis[..., 1], axis[..., 0]
    s = np.sin(theta)[..., None]
    c = np.cos(theta)[..., None]
    return np.eye(3) + s * K + (1 - c) * (K @ K)


def _mat_to_rotvec(R):
    """Rotation matrices [N,3,3] -> axis-angle [N,3]."""
    tr = np.clip((np.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = np.arccos(tr)
    w = np.stack([R[..., 2, 1] - R[..., 1, 2],
                  R[..., 0, 2] - R[..., 2, 0],
                  R[..., 1, 0] - R[..., 0, 1]], -1)
    s = 2 * np.sin(theta)
    small = theta < 1e-6
    axis = w / np.where(small, 1.0, s)[..., None]
    return np.where(small[..., None], w / 2.0, axis * theta[..., None])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True,
                   help="raw CAPE root: <data-dir>/<tgt-subj>/<seq>/*.npz")
    p.add_argument("--out", default="./load/animation")
    p.add_argument("--src-subj", default="male-3-casual",
                   help="subject whose shape (betas) drives the avatar")
    p.add_argument("--tgt-subj", default="00032")
    p.add_argument("--seq", default="shortlong_soccer")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=-1)
    p.add_argument("--skip", type=int, default=1)
    p.add_argument("--rotate", action="store_true",
                   help="append a 50-frame 360-degree orbit of the last pose")
    p.add_argument("--betas-file", default=None,
                   help="override: npz containing the betas "
                        "(default ./load/peoplesnapshot/<src-subj>/poses/"
                        "anim_nerf_train.npz)")
    p.add_argument("--visualize", action="store_true",
                   help="dump SMPL overlay renders (needs --smpl-model)")
    p.add_argument("--smpl-model", default=None,
                   help="SMPL .pkl for --visualize")
    args = p.parse_args()

    out_dir = os.path.join(args.out, args.src_subj,
                           f"cape_{args.tgt_subj}_{args.seq}")
    os.makedirs(out_dir, exist_ok=True)

    betas_file = args.betas_file or os.path.join(
        "./load/peoplesnapshot", args.src_subj, "poses/anim_nerf_train.npz")
    betas = dict(np.load(betas_file))["betas"].reshape(-1)[:10]

    seq_dir = os.path.join(args.data_dir, args.tgt_subj, args.seq)
    pose_files = sorted(glob.glob(os.path.join(seq_dir, f"{args.seq}*.npz")))
    if not pose_files:
        raise FileNotFoundError(f"no {args.seq}*.npz under {seq_dir}")

    poses, trans = [], []
    for f in pose_files:
        d = dict(np.load(f))
        poses.append(np.asarray(d["pose"], np.float32).reshape(-1)[:72])
        trans.append(np.asarray(d["transl"], np.float32).reshape(3))
    thetas = np.stack(poses)
    transl = np.stack(trans)

    # flip the capture upright: root orientation rotated 180deg about x
    flip = _rotvec_to_mat(np.array([[np.pi, 0.0, 0.0]], np.float32))[0]
    thetas[:, :3] = _mat_to_rotvec(flip @ _rotvec_to_mat(thetas[:, :3]))

    # zero the unreliable hand / feet joints (7,8,10,11,20..23)
    for j in (7, 8, 10, 11, 20, 21, 22, 23):
        thetas[:, 3 * j: 3 * j + 3] = 0.0

    end = len(thetas) if args.end == -1 else args.end + 1
    sl = slice(args.start, end, args.skip)
    thetas, transl = thetas[sl], transl[sl]

    H = W = 1024
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 2000.0
    K[0, 2] = K[1, 2] = H // 2
    base_ext = np.eye(4, dtype=np.float32)
    base_ext[2, 3] = 0.0  # identity c2w; transl places the body

    extrinsics = [base_ext.copy() for _ in range(len(thetas))]
    if args.rotate:
        last_t = transl[-1]
        for az in np.linspace(0, 2 * np.pi, 50):
            Ry = np.array([[np.cos(az), 0, np.sin(az)],
                           [0, 1, 0],
                           [-np.sin(az), 0, np.cos(az)]], np.float32)
            R = Ry @ base_ext[:3, :3]
            t = -R @ last_t + last_t + base_ext[:3, 3]
            E = np.eye(4, dtype=np.float32)
            E[:3, :3], E[:3, 3] = R, t
            extrinsics.append(E)
            thetas = np.concatenate([thetas, thetas[-1:]], 0)
            transl = np.concatenate([transl, transl[-1:]], 0)

    n = len(thetas)
    np.savez(os.path.join(out_dir, "poses.npz"),
             thetas=thetas, transl=transl, betas=betas)
    np.savez(os.path.join(out_dir, "cameras.npz"),
             height=np.full(n, H), width=np.full(n, W),
             intrinsic=np.stack([K] * n),
             extrinsic=np.stack(extrinsics))
    print(f"wrote {n} frames -> {out_dir}")

    if args.visualize:
        import cv2
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from intrinsicavatar_tpu.anim.smpl import load_body_model, \
            smpl_forward
        from intrinsicavatar_tpu.utils.smpl_renderer import overlay_smpl

        model = load_body_model(args.smpl_model,
                                "male" if args.src_subj.startswith("male")
                                else "female")
        vis_dir = os.path.join(out_dir, "smpl_vis")
        os.makedirs(vis_dir, exist_ok=True)
        for i in range(n):
            o = smpl_forward(model, jnp.asarray(betas),
                             jnp.asarray(thetas[i, 3:]),
                             jnp.asarray(thetas[i, :3]),
                             jnp.asarray(transl[i]))
            img = overlay_smpl(np.zeros((H, W, 3), np.uint8),
                               np.asarray(o.vertices), np.asarray(model.faces),
                               K, extrinsics[i])
            cv2.imwrite(os.path.join(vis_dir, f"{i:04d}.png"),
                        img[..., ::-1])


if __name__ == "__main__":
    main()
