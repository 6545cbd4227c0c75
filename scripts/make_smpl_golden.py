"""Generate SMPL LBS golden outputs from the reference implementation.

Dev-time only: loads the reference's pure ``lbs()``
(`models/deformers/smplx/lbs.py:152-250` in taconite/IntrinsicAvatar) as a
module, runs it on the synthetic body model this repo's tests use, and
dumps verts/joints/A for a set of (betas, pose) combinations to
``tests/golden/smpl_golden.npz``.  The committed npz is what the test
suite consumes (`tests/test_anim.py::test_smpl_matches_reference_golden`);
re-run this script only if the synthetic body or the pose set changes.

Usage:  python scripts/make_smpl_golden.py [--reference /root/reference]
"""

import argparse
import importlib.util
import os
import sys
import types

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_reference_lbs(ref_root):
    """Import the reference lbs module standalone (no package side effects)."""
    smplx_dir = os.path.join(ref_root, "models", "deformers", "smplx")
    pkg = types.ModuleType("ref_smplx")
    pkg.__path__ = [smplx_dir]
    sys.modules["ref_smplx"] = pkg
    for name in ("utils", "lbs"):
        spec = importlib.util.spec_from_file_location(
            f"ref_smplx.{name}", os.path.join(smplx_dir, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_smplx.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_smplx.lbs"].lbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "smpl_golden.npz"))
    args = ap.parse_args()

    lbs = load_reference_lbs(args.reference)

    from intrinsicavatar_tpu.anim.smpl import make_synthetic_body_model
    body = make_synthetic_body_model(n_surface_verts=1200)

    rng = np.random.default_rng(42)
    cases_betas = []
    cases_pose = []  # 72 = global_orient(3) + body_pose(69)
    # case 0: rest pose, zero betas
    cases_betas.append(np.zeros(10, np.float32))
    cases_pose.append(np.zeros(72, np.float32))
    # case 1: A-pose
    p = np.zeros(72, np.float32)
    p[3 + 2], p[3 + 5] = 0.2, -0.2
    p[3 + 47], p[3 + 50] = -0.8, 0.8
    cases_betas.append(np.zeros(10, np.float32))
    cases_pose.append(p)
    # cases 2-4: random betas + random poses (small angles), random root
    for _ in range(3):
        cases_betas.append(rng.normal(scale=0.5, size=10).astype(np.float32))
        pose = rng.normal(scale=0.3, size=72).astype(np.float32)
        cases_pose.append(pose)

    betas = torch.tensor(np.stack(cases_betas))
    pose = torch.tensor(np.stack(cases_pose))
    B = betas.shape[0]

    v_template = torch.tensor(body.v_template)[None].expand(B, -1, -1)
    shapedirs = torch.tensor(body.shapedirs)
    posedirs = torch.tensor(body.posedirs)
    j_regressor = torch.tensor(body.j_regressor)
    parents = torch.tensor(body.parents.astype(np.int64))
    lbs_weights = torch.tensor(body.lbs_weights)

    with torch.no_grad():
        verts, joints, A, T, _, _ = lbs(
            betas.double(), pose.double(), v_template.double(),
            shapedirs.double(), posedirs.double(), j_regressor.double(),
            parents, lbs_weights.double())

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(
        out,
        betas=np.stack(cases_betas),
        pose=np.stack(cases_pose),
        verts=verts.float().numpy(),
        joints=joints.float().numpy(),
        A=A.float().numpy(),
    )
    print("wrote", out, "cases:", B, "verts:", verts.shape)


if __name__ == "__main__":
    main()
