"""Fill the README run-regime table from the committed run metrics.

Reads ``results/capsule-m3c-r5/metrics.jsonl`` (written by
``collect_results.py`` from the r5 training run) and summarizes the
wall-true throughput per regime: radiance = steps below the phys
kick-in, phys = steps at/after it.  Medians over steady-state windows
(those whose ``wall_dispatch_s`` is under 1 s — windows containing a
resume compile, milestone recompile or occupancy re-init are excluded).

Usage: python scripts/gen_runregime_table.py [--metrics PATH] [--kick 3000]
"""

import argparse
import json
import os
import re

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def summarize(path, kick):
    rad, phys = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "rays_per_sec_wall" not in rec:
                continue
            if rec.get("wall_dispatch_s", 0.0) > 1.0:
                continue  # window contains a compile/reinit stall
            (phys if rec["step"] >= kick else rad).append(
                rec["rays_per_sec_wall"])
    med = lambda xs: float(np.median(xs)) if xs else None
    return med(rad), med(phys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics",
                    default=os.path.join(ROOT, "results", "capsule-m3c-r5",
                                         "metrics.jsonl"))
    ap.add_argument("--kick", type=int, default=3000)
    args = ap.parse_args()
    if not os.path.exists(args.metrics):
        print("no metrics at", args.metrics)
        return 1
    rad, phys = summarize(args.metrics, args.kick)
    fmt = lambda v: f"{v:.0f} rays/s" if v is not None else "pending"

    block = (
        "<!-- runregime-table:begin -->\n"
        "| regime | spec | round 3 (async tick) | round 5 (wall-true) |\n"
        "|---|---|---|---|\n"
        f"| run regime, radiance | 2048 rays x 64 samples, occ 64³ | "
        f"~2 500 rays/s | {fmt(rad)} |\n"
        f"| run regime, phys | + 128 spp secondary scattering | "
        f"~410 rays/s | {fmt(phys)} |\n"
        "<!-- runregime-table:end -->")
    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()
    new = re.sub(r"<!-- runregime-table:begin -->.*?"
                 r"<!-- runregime-table:end -->", block, text, flags=re.S)
    if new != text:
        with open(readme, "w") as f:
            f.write(new)
        print("README run-regime table updated:",
              "radiance", fmt(rad), "| phys", fmt(phys))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
