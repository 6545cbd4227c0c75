#!/bin/bash
# Babysitter for the round-5 TPU pipeline: waits for the running train
# stage, resumes it (up to 3 times) if it died before the final
# checkpoint, then chains the post-training stages unattended:
#   relight protocol -> full bench (warm driver cache + in-round
#   numbers) -> profile matrix (lever-table attribution).
# Survives builder-session death: start with
#   nohup bash scripts/round5_watch.sh <train_stage_pid> &
# NEVER SIGKILLs anything (a KILLed client wedges the axon tunnel).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round5_tpu
mkdir -p $LOG
pid="${1:-$(cat /tmp/trainstage.pid 2>/dev/null || echo 0)}"

note() { echo "[watch $(date +%H:%M:%S)] $*" | tee -a $LOG/watch.log; }

final_ckpt() {  # the train stage saves ckpt/final on clean completion
  ls -d exp/capsule-m3c-r*/*/ckpt/final 2>/dev/null | tail -1
}

note "watching train stage pid=$pid"
for attempt in 1 2 3; do
  while [ "$pid" != 0 ] && kill -0 "$pid" 2>/dev/null; do sleep 60; done
  if [ -n "$(final_ckpt)" ]; then
    note "train complete: $(final_ckpt)"
    break
  fi
  note "train stage died before final ckpt (attempt $attempt) — resuming"
  bash scripts/round5_tpu.sh train >> $LOG/train_stage_resume.out 2>&1 &
  pid=$!
  echo $pid > /tmp/trainstage.pid
  sleep 120   # give it time to claim the chip before polling
done

if [ -z "$(final_ckpt)" ]; then
  note "train never completed after 3 attempts; proceeding with newest ckpt"
fi

note "bench (BENCH_DEADLINE_S=5400 so all regimes land + cache is hot)"
BENCH_DEADLINE_S=5400 python bench.py > $LOG/bench_r5.json 2> $LOG/bench_r5.err
note "relight stage"
bash scripts/round5_tpu.sh relight >> $LOG/relight_stage.out 2>&1
note "intermediate finalize: bank bench+relight evidence now"
bash scripts/round5_finalize.sh >> $LOG/finalize.out 2>&1
note "profile matrix"
bash scripts/round5_tpu.sh profile >> $LOG/profile_stage.out 2>&1
note "finalize: bank artifacts into the repo"
bash scripts/round5_finalize.sh >> $LOG/finalize.out 2>&1
note "all stages done"
