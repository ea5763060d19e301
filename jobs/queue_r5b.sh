#!/bin/bash
# Round-5 queue, take 2 — relaunched after the UnboundLocalError in
# demo_accuracy_table.py killed both flagship runs AT EVAL TIME (after
# their full 24k-step trainings; results/queue_r5.log). The script is fixed
# and now checkpoints trained params to results/acc_ckpt_<tag>.pkl, so an
# eval-side failure costs a relaunch, not a retrain.
#
# Launch DETACHED:
#   setsid nohup bash jobs/queue_r5b.sh > results/queue_r5b.log 2>&1 < /dev/null &
#
# The script records ITS OWN pid (not the setsid wrapper's — the first
# queue's pid file was off by one fork, which made the kill miss and let
# the queue advance a job).
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5b.pid
mark() { echo "[queue_r5b] $(date -u +%H:%M:%S) $*" ; }

# (1) roi_sim_heads=4 + count_embed flagship — decides the promotion
# question (DESIGN.md par.12/13). Paired with the r4 0.632 flagship.
mark "flagship +roi_sim_heads=4 +count_embed starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_ROI_SIM=1 DEMO_SIM_HEADS=4 DEMO_COUNT_EMBED=1 \
  DEMO_OUT=results/flagship_roisim.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  >> results/flagship_roisim.log 2>&1
mark "flagship +roi_sim done rc=$?"

# (1b) Palette-matched apples-to-apples bound for the +5.5 box_roi claim
# (hop 0.3, palette 8 = the r3 corpus colors).
mark "flagship box_roi palette-8 (corpus-term bound) starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_HOP_PROB=0.3 DEMO_PALETTE=8 DEMO_OUT=results/flagship_palette8.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  >> results/flagship_palette8.log 2>&1
mark "flagship palette-8 done rc=$?"

# (2) Scheduled sampling at flagship scale (VERDICT r3 #6). Seed-resumable
# via results/scheduled_at_scale_ckpt.json.
mark "scheduled-at-scale starting"
timeout 14400 python scripts/demo_scheduled_at_scale.py \
  >> results/sched_scale_r5.log 2>&1
mark "scheduled-at-scale done rc=$?"

# (3) Slow-suite cold vs warm timing (compilation-cache benefit).
mark "slow suite cold (builds cache)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_cold.log 2>&1
mark "slow suite cold rc=$?"
mark "slow suite warm (measures cache benefit)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_warm.log 2>&1
mark "slow suite warm rc=$?"
mark "queue complete"
