"""Convert published LPIPS-VGG checkpoints to the npz bundle that
``intrinsicavatar_tpu.utils.lpips_jax`` loads.

Run on a machine WITH torchvision + the ``lpips`` package (this build
environment has neither nor network egress):

    python scripts/convert_lpips_weights.py --out lpips_vgg.npz
    export INTRINSICAVATAR_LPIPS_WEIGHTS=$PWD/lpips_vgg.npz

Keys written: ``conv{i}_w [kh,kw,cin,cout], conv{i}_b`` for the 13 VGG16
convs (torch OIHW -> HWIO) and ``lin{j}_w [c]`` for the 5 LPIPS linear
heads (`systems/criterions.py:105-126` uses lpips.LPIPS(net='vgg')).
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import lpips as lpips_pkg
    import torch

    net = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] \
        + [m for m in net.net.slice3] + [m for m in net.net.slice4] \
        + [m for m in net.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13, len(convs)
    for i, m in enumerate(convs):
        out[f"conv{i}_w"] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}_b"] = m.bias.detach().numpy()
    for j, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()   # [1, C, 1, 1]
        out[f"lin{j}_w"] = w.reshape(-1)
    np.savez(args.out, **out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
