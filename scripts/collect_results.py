"""Collect committed evidence from a training run.

Copies the run's config, metric log, aggregate metrics and a bounded set
of validation images from the (gitignored) exp/ tree into results/<name>/
for the repository record.

Usage: python scripts/collect_results.py exp/tiny-capsule/<ts> [--name X]
"""

import argparse
import json
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--name", default=None)
    ap.add_argument("--max-images", type=int, default=8)
    args = ap.parse_args()

    run = args.run_dir.rstrip("/")
    name = args.name or os.path.basename(os.path.dirname(run))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "results", name)
    os.makedirs(out, exist_ok=True)

    for f in ("config.json", "metrics.jsonl", "metrics.json"):
        src = os.path.join(run, f)
        if os.path.exists(src):
            shutil.copy(src, out)

    val = os.path.join(run, "val")
    if os.path.isdir(val):
        imgs = sorted(os.listdir(val))
        # keep the first, a middle and the latest validation dumps
        keep = imgs[:2] + imgs[len(imgs) // 2:len(imgs) // 2 + 2] \
            + imgs[-args.max_images + 4:]
        os.makedirs(os.path.join(out, "val"), exist_ok=True)
        for f in dict.fromkeys(keep):
            shutil.copy(os.path.join(val, f), os.path.join(out, "val", f))

    save = os.path.join(run, "save")
    if os.path.isdir(save):
        os.makedirs(os.path.join(out, "save"), exist_ok=True)
        entries = sorted(os.listdir(save))
        pngs = [f for f in entries if f.endswith(".png")]
        extras = [f for f in entries
                  if f.endswith((".obj", ".exr", ".hdr"))]
        for f in pngs[:args.max_images] + extras:
            shutil.copy(os.path.join(save, f), os.path.join(out, "save", f))

    # summarize the val metric curve into one json for quick reading
    curve = []
    mj = os.path.join(run, "metrics.jsonl")
    if os.path.exists(mj):
        for line in open(mj):
            rec = json.loads(line)
            if any(k.startswith("val/") for k in rec):
                curve.append(rec)
    if curve:
        with open(os.path.join(out, "val_curve.json"), "w") as f:
            json.dump(curve, f, indent=2)
    print("collected into", os.path.abspath(out))


if __name__ == "__main__":
    main()
