#!/bin/bash
# Round-5 queue, take 3 — reprioritized after the roi_sim+count_embed
# flagship landed (results/flagship_roisim.md): the combined run regressed
# overall 0.632->0.613 with count down and same_color recall flat, but it
# changed TWO channels at once.  A roi_sim-ONLY d=192 flagship is inserted
# ahead of the long scheduled/slow-suite jobs to disentangle the decision
# (equal_*/box-precision wins look like roi_sim's; the count regression
# looks like count_embed's — DESIGN.md par-12/13 round-5 paragraphs).
#
# Waits for the orphaned palette-8 flagship (pid passed as $1, started by
# queue_r5b before its bash was killed) to finish first.
#
# Launch DETACHED:
#   setsid nohup bash jobs/queue_r5c.sh <palette8_pid> \
#     > results/queue_r5c.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5c.pid
mark() { echo "[queue_r5c] $(date -u +%H:%M:%S) $*" ; }

WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != "0" ]; then
  mark "waiting for palette-8 flagship (pid $WAIT_PID) to finish"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  mark "palette-8 flagship exited"
fi

# (A) roi_sim-only d=192 flagship — disentangles the combined run: does
# roi_sim alone keep the equal_*/precision wins without the count/overall
# regression?  Paired with the r4 0.632 box_roi flagship AND the r5
# combined run (same corpus/protocol/seed).  PER_FN_CONF=1 adds the
# per-function operating-point tables in the same run (eval-only cost).
mark "flagship +roi_sim_heads=4 (NO count_embed) starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_ROI_SIM=1 DEMO_SIM_HEADS=4 DEMO_PER_FN_CONF=1 \
  DEMO_OUT=results/flagship_roisim_only.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  >> results/flagship_roisim_only.log 2>&1
mark "flagship roi_sim-only done rc=$?"

# (A2) per-function operating points for the COMBINED flagship — eval-only
# resume from results/acc_ckpt_flagship_roisim.pkl (env must match the
# checkpoint signature exactly; PER_FN_CONF is not in the sig).  Tests
# whether same_color recall 0.078 is a confidence-calibration artifact
# (model ranks matches correctly but below the global 0.50 gate) or a
# genuine detection miss.
mark "per-fn conf eval-only resume of combined flagship starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_ROI_SIM=1 DEMO_SIM_HEADS=4 DEMO_COUNT_EMBED=1 DEMO_PER_FN_CONF=1 \
  DEMO_OUT=results/flagship_roisim.md \
  timeout 3600 python scripts/demo_accuracy_table.py \
  >> results/flagship_roisim.log 2>&1
mark "per-fn conf eval done rc=$?"

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
