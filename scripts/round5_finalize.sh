#!/bin/bash
# Bank the round-5 pipeline artifacts into the repository so the round's
# evidence survives even if no interactive session is alive when the
# stages finish: profile rows -> results/profile_r5.jsonl + README lever
# table, in-round bench lines -> README bench column (dagger), train +
# relight run evidence -> results/, then one git commit.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round5_tpu

python scripts/gen_lever_table.py --logs $LOG || true

if [ -s $LOG/bench_r5.json ]; then
  python scripts/gen_bench_table.py --manual $LOG/bench_r5.json --round 5 \
    || true
fi

train_run=""
final=$(ls -d exp/capsule-m3c-r*/*/ckpt/final 2>/dev/null | tail -1)
if [ -n "$final" ]; then
  train_run=$(dirname "$(dirname "$final")")
else
  last=$(ls -d exp/capsule-m3c-r*/*/ckpt/step* 2>/dev/null | sort -V | tail -1)
  [ -n "$last" ] && train_run=$(dirname "$(dirname "$last")")
fi
if [ -n "$train_run" ]; then
  python scripts/collect_results.py "$train_run" --name capsule-m3c-r5 || true
  python scripts/gen_runregime_table.py || true
fi

# the relight (test-mode) run dir is the newest one that is not the
# training run
relight_run=$(ls -dt exp/capsule-m3c-r*/*/ 2>/dev/null \
              | sed 's:/$::' | grep -v "^$train_run$" | head -1)
if [ -n "$relight_run" ] && [ "$relight_run" != "$train_run" ]; then
  python scripts/collect_results.py "$relight_run" \
    --name capsule-m3c-r5-relight || true
fi

git add results/ README.md 2>/dev/null
git diff --cached --quiet || git commit -m \
  "round5 pipeline artifacts: profile matrix, bench column, run evidence"
echo "finalize done"
