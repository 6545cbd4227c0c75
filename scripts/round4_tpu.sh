#!/bin/bash
# Round-4 TPU checklist — run the moment the axon tunnel recovers.
# Each step is independent; later steps assume earlier numbers exist but
# do not require them.  NEVER SIGKILL any process started here: a KILLed
# client wedges the tunnel for everyone (see README "Operational notes").
#
# Usage:  bash scripts/round4_tpu.sh [stage]
#   stage ∈ {bench, profile, phys, all}   (default: bench)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round4_tpu
mkdir -p $LOG
stage="${1:-bench}"

run() {  # run <name> <cmd...>  — logs, never SIGKILLs
  local name=$1; shift
  echo "=== $name: $* ==="
  "$@" 2>&1 | tee "$LOG/$name.log"
}

if [ "$stage" = bench ] || [ "$stage" = all ]; then
  # 1. The round's whole point: driver-verifiable numbers.
  run bench python bench.py
fi

if [ "$stage" = profile ] || [ "$stage" = all ]; then
  # 2. Stage attribution for the two eval regimes + lever on/off deltas.
  run prof_relight      python scripts/profile_stages.py relight --chunk 1024
  run prof_relight_nosg python scripts/profile_stages.py relight --chunk 1024 --no-seed-grid
  run prof_phys         python scripts/profile_stages.py phys
  run prof_radiance     python scripts/profile_stages.py radiance
fi

if [ "$stage" = phys ] || [ "$stage" = all ]; then
  # 3. Finish the phys phase: resume the r3 checkpoint to scheduled end,
  #    checkpointing every 100 steps so a crash costs minutes.
  run phys python -m intrinsicavatar_tpu.launch \
    --config configs/capsule-m3c-r3.yaml --exp-dir exp \
    --resume exp/capsule-m3c-r3/20260817-180621/ckpt/step4200 \
    trainer.ckpt_every_n_steps=100
fi
