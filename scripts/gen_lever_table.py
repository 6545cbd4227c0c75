"""Collect profile-matrix rows into a committed artifact + README table.

Reads the per-variant JSON lines produced by ``scripts/profile_stages.py``
(one log file per variant, as written by ``round5_tpu.sh profile`` into
``/tmp/round5_tpu/prof_*.log``), copies them verbatim to
``results/profile_r5.jsonl`` (the traceable artifact), and rewrites the
README block between ``<!-- lever-table:begin -->`` and
``<!-- lever-table:end -->`` so every lever cell traces to a committed
measurement (VERDICT r4 asks #4/#6: measured on/off deltas, no guesses).

Usage: python scripts/gen_lever_table.py [--logs /tmp/round5_tpu] [--check]
"""

import argparse
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect(log_dir):
    rows = []
    for path in sorted(glob.glob(os.path.join(log_dir, "prof_*.log"))):
        row = None
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and '"variant"' in line:
                    try:
                        row = json.loads(line)
                    except ValueError:
                        pass
        if row is not None:
            row["_log"] = os.path.basename(path)
            rows.append(row)
    return rows


def fmt_rate(row):
    if "spp_px_per_sec" in row:
        v = row["spp_px_per_sec"]
        return (f"{v/1e3:.1f}k spp*px/s" if v >= 1e3
                else f"{v:.0f} spp*px/s")
    return f"{row.get('rays_per_sec', 0):.0f} rays/s"


def table(rows):
    lines = ["| variant | ms/iter | rate |", "|---|---|---|"]
    for r in rows:
        ms = r.get("ms_per_step", r.get("ms", ""))
        lines.append(f"| `{r['variant']}` | {ms} | {fmt_rate(r)} |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="/tmp/round5_tpu")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    rows = collect(args.logs)
    if not rows:
        print("no prof_*.log rows found under", args.logs)
        return 1

    art = os.path.join(ROOT, "results", "profile_r5.jsonl")
    with open(art, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} rows to {art}")

    block = ("<!-- lever-table:begin -->\n"
             "Profile matrix (one process per variant, v5e chip; raw rows "
             "in `results/profile_r5.jsonl`):\n\n" + table(rows) +
             "\n<!-- lever-table:end -->")
    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()
    pat = re.compile(r"<!-- lever-table:begin -->.*?<!-- lever-table:end -->",
                     re.S)
    if pat.search(text):
        new = pat.sub(block, text)
    else:
        # first run: insert after the bench table block
        anchor = "<!-- bench-table:end -->"
        new = text.replace(anchor, anchor + "\n\n" + block, 1)
    if args.check:
        return 0 if new == text else 1
    if new != text:
        with open(readme, "w") as f:
            f.write(new)
        print("README lever table updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
