#!/bin/bash
# Round-5 TPU runbook.  No checkpoint survived the round-4/5 machine
# reset (exp/ is gitignored), so the phys phase TRAINS FROM SCRATCH —
# the full 5000-step compressed r3 recipe (4000 radiance + 1000 phys),
# then the relight protocol from the final checkpoint.
# NEVER SIGKILL any process started here: a KILLed client wedges the
# axon tunnel (see README "Operational notes").
#
# Usage:  bash scripts/round5_tpu.sh [stage]
#   stage ∈ {bench, train, relight, profile, all}   (default: bench)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round5_tpu
mkdir -p $LOG
stage="${1:-bench}"

run() {  # run <name> <cmd...>  — logs, never SIGKILLs
  local name=$1; shift
  echo "=== $name: $* ==="
  "$@" 2>&1 | tee "$LOG/$name.log"
}

if [ "$stage" = bench ] || [ "$stage" = all ]; then
  # Driver-verifiable numbers + a hot .jax_cache for the driver's run.
  run bench python bench.py
fi

if [ "$stage" = train ] || [ "$stage" = all ]; then
  # The r5 recipe (configs/capsule-m3c-r5.yaml): identical to r3 up to
  # step 2500, phys phase pulled forward to 3000 and widened to 800
  # steps.  Checkpoint every 100 steps so a crash costs minutes.
  # grad_accum=2 halves the microbatch (same effective 2048 rays): the
  # importance kick-in at step 300 compiles a second step variant and
  # the un-accumulated peak OOMed the 16GB chip there (round-5 first
  # attempt).  Resumes from the newest checkpoint when one exists
  # (including r3-recipe checkpoints — the schedules agree below 2500).
  # A persistent wall deadline (TRAIN_BUDGET_S from first invocation,
  # default 4 h) bounds the *stage*, not each resume: training past the
  # deadline exits cleanly with a final checkpoint so the relight /
  # bench / profile stages always get their window on the chip.
  dl_file=$LOG/train_deadline_ts
  if [ ! -f "$dl_file" ]; then
    echo $(( $(date +%s) + ${TRAIN_BUDGET_S:-14400} )) > "$dl_file"
  fi
  deadline=$(cat "$dl_file")
  ckpt=$(ls -d exp/capsule-m3c-r*/*/ckpt/step* 2>/dev/null \
         |  sort -V | tail -1)
  resume=(); [ -n "$ckpt" ] && resume=(--resume "$ckpt")
  # budget_boost_init=4: the escalator learned level 4 by step 600 of
  # this recipe (overflows at 525/550); seeding it on resume skips the
  # expensive mid-run recompiles over the tunnel.
  run train python -m intrinsicavatar_tpu.launch \
    --config configs/capsule-m3c-r5.yaml --exp-dir exp \
    "${resume[@]}" \
    system.budget_boost_init=4 "trainer.deadline_ts=$deadline"
fi

if [ "$stage" = relight ] || [ "$stage" = all ]; then
  # prefer the clean-completion checkpoint; else the newest step ckpt
  ckpt=$(ls -d exp/capsule-m3c-r*/*/ckpt/final 2>/dev/null | tail -1)
  [ -z "$ckpt" ] && ckpt=$(ls -d exp/capsule-m3c-r*/*/ckpt/step* \
                           2>/dev/null | sort -V | tail -1)
  if [ -z "$ckpt" ]; then echo "no checkpoint for relight"; exit 1; fi
  # 8 stride-sampled test frames (of 24) keep the full pose range while
  # fitting the relight protocol in ~25 min at 256 spp
  run relight python -m intrinsicavatar_tpu.launch \
    --config configs/capsule-m3c-r5.yaml --exp-dir exp \
    --mode test --resume "$ckpt" \
    dataset.hdri_filepath=procedural model.render_mode=light \
    model.samples_per_pixel=256 dataset.max_frames=8
fi

if [ "$stage" = profile ] || [ "$stage" = all ]; then
  # Stage attribution + lever on/off deltas for the README lever table,
  # decision-critical variants first (each is a separate process and may
  # pay a cold compile over the tunnel; if the round ends mid-matrix the
  # bench-config-deciding rows are already banked).
  run prof_relight       python scripts/profile_stages.py relight --chunk 1024
  run prof_relight_chunk python scripts/profile_stages.py relight --chunk 2048
  run prof_relight_c4k   python scripts/profile_stages.py relight --chunk 4096
  run prof_phys          python scripts/profile_stages.py phys
  run prof_phys_tsg      python scripts/profile_stages.py phys \
                           --set train_seed_grid=true
  run prof_relight_qc25  python scripts/profile_stages.py relight \
                           --chunk 1024 --set query_compaction=0.25
  run prof_relight_nosg  python scripts/profile_stages.py relight --chunk 1024 --no-seed-grid
  run prof_radiance      python scripts/profile_stages.py radiance
  run prof_radiance_tsg  python scripts/profile_stages.py radiance \
                           --set train_seed_grid=true \
                           --set train_seed_grid_scope=all
  # stage attribution (forward vs backward vs importance rounds)
  run prof_radiance_fwd  python scripts/profile_stages.py radiance \
                           --forward-only
  run prof_radiance_noimp python scripts/profile_stages.py radiance \
                           --no-importance
  run prof_phys_fwd      python scripts/profile_stages.py phys --forward-only
  # standing opt-in levers (round-3 ask #4: measure, then flip or kill)
  run prof_radiance_conc python scripts/profile_stages.py radiance \
                           --concentrate 4
  # adaptive_query_compaction's steady-state effect is a static budget
  # fraction (the fit-loop controller picks the bucket); probe the
  # bucket the r5 run's measured valid fraction (~0.42) would NOT
  # shrink below, and one tighter, as the on/off cost proxy
  run prof_radiance_qc31 python scripts/profile_stages.py radiance \
                           --set query_compaction=0.3125
  run prof_phys_qc31     python scripts/profile_stages.py phys \
                           --set query_compaction=0.3125
fi
