#!/bin/bash
# Round-5 TPU job queue — the runs round 4 could not finish (sandbox resets
# killed two detached queues; see CLAUDE.md "Round 4 session 3").
#
# Launch DETACHED at the very start of the session:
#   setsid nohup bash jobs/queue_r5.sh > results/queue_r5.log 2>&1 < /dev/null &
#   echo $! > /tmp/queue_r5.pid
#
# Rules this script encodes (CLAUDE.md "Platform gotchas"):
#  - ONE python job at a time — the host has a single CPU and a TPU run
#    starves if anything else runs. Jobs are strictly sequential.
#  - All outputs/checkpoints under results/ (committed by the driver at
#    session end), NEVER /tmp (wiped on resets).
#  - Every demo script splices DEMO.md incrementally or is seed-resumable,
#    so a mid-job kill still leaves a harvestable partial.
set -u
cd "$(dirname "$0")/.."
mkdir -p results
mark() { echo "[queue_r5] $(date -u +%H:%M:%S) $*" ; }

# (0) Finish the 20k-step executor data-efficiency sweep. The script is
# resumable: completed points live in results/dataeff_rows_20000.json and
# are skipped; it exits quickly if all three are done.
mark "dataeff 20k starting (resumes from results/dataeff_rows_20000.json)"
DEMO_SIZES="5600,700,70" DEMO_EXE_STEPS=20000 \
  timeout 7200 python scripts/demo_executor_data_efficiency.py \
  > results/dataeff20k_r5.log 2>&1
mark "dataeff 20k done rc=$?"

# (1) roi_sim_heads=4 + count_embed flagship on the relational corpus
# (decides the roi_sim/count_embed default-vs-opt-in question, DESIGN.md
# par.12/13 — BOTH channels on, per the advisor: without DEMO_COUNT_EMBED=1
# the d=192 evidence par.13 defers to would never be produced). Same knobs
# as the r4 flagship (0.632) except the two channels, so the comparison is
# paired; attribution between the two channels falls back to the d=96
# GT-fed diagnostics if the joint run is mixed.
mark "flagship +roi_sim_heads=4 +count_embed starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_ROI_SIM=1 DEMO_SIM_HEADS=4 DEMO_COUNT_EMBED=1 \
  DEMO_OUT=results/flagship_roisim.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  > results/flagship_roisim.log 2>&1
mark "flagship +roi_sim done rc=$?"

# (1b) Palette-matched apples-to-apples bound (DEMO.md "Corpus caveat"):
# the r3-vs-r4 +5.5 comparison changed scene palettes along with box_roi;
# this rerun (hop 0.3, DEMO_PALETTE=8 = r3's uniform colors) bounds how
# much of the +5.5 is corpus drift vs box_roi.
mark "flagship box_roi palette-8 (corpus-term bound) starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_HOP_PROB=0.3 DEMO_PALETTE=8 DEMO_OUT=results/flagship_palette8.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  > results/flagship_palette8.log 2>&1
mark "flagship palette-8 done rc=$?"

# (2) Scheduled sampling at flagship scale (VERDICT r3 #6). Seed-resumable:
# the checkpoint defaults to results/scheduled_at_scale_ckpt.json, so a
# killed run resumes at the next completed seed.
mark "scheduled-at-scale starting"
timeout 14400 python scripts/demo_scheduled_at_scale.py \
  > results/sched_scale_r5.log 2>&1
mark "scheduled-at-scale done rc=$?"

# (3) Slow-suite timing with a warm compilation cache (VERDICT r3 #7
# follow-up). Two back-to-back runs: the first builds the repo-local cache,
# the second measures warm. CPU-only — safe to run last, after TPU work.
mark "slow suite cold (builds cache)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_cold.log 2>&1
mark "slow suite cold rc=$?"
mark "slow suite warm (measures cache benefit)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_warm.log 2>&1
mark "slow suite warm rc=$?"
mark "queue complete"
