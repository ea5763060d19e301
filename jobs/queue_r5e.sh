#!/bin/bash
# Round-5 queue, take 5 — replaces queue_r5d's controller (killed after its
# job 1 started) to insert the QUICK TEST GATE between the flagship
# decision runs and the long sched/slow-suite jobs: this session changed
# cli/main.py (tally --conf_thresholds/--save_conf_thresholds) and
# cli/repro.py (--per_fn_conf), and the quick gate must be green before
# round end regardless of whether the tail jobs finish.
#
# $1 = pid of queue_r5d's still-running job-1 flagship (timeout wrapper);
# waits for it, then proceeds.
#
# Launch DETACHED:
#   setsid nohup bash jobs/queue_r5e.sh <job1_pid> \
#     > results/queue_r5e.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5e.pid
mark() { echo "[queue_r5e] $(date -u +%H:%M:%S) $*" ; }

WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != "0" ]; then
  mark "waiting for box_roi per-fn flagship (pid $WAIT_PID) to finish"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  mark "box_roi per-fn flagship exited"
fi

# (2) roi_sim(K=4)+count_embed flagship, per-fn conf train-fit — the other
# cell of the promotion decision matrix (see jobs/queue_r5d.sh header).
mark "flagship roi_sim+count_embed, per-fn conf train-fit, starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_ROI_SIM=1 DEMO_SIM_HEADS=4 DEMO_COUNT_EMBED=1 \
  DEMO_PER_FN_CONF=1 DEMO_CONF_FIT=train \
  DEMO_OUT=results/flagship_roisim_trainfit.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  >> results/flagship_roisim_trainfit.log 2>&1
mark "flagship roi_sim+count_embed per-fn train-fit done rc=$?"

# (2b) quick test gate — validates this session's CLI changes while the
# TPU is briefly free (the slow set runs at the end of the queue).
mark "quick gate starting"
timeout 2400 python -m pytest tests/ -q -m "not slow" \
  > results/quickgate_r5.log 2>&1
mark "quick gate rc=$? ($(tail -1 results/quickgate_r5.log))"

# (3) Scheduled sampling at flagship scale (VERDICT r3 #6 / r4 #5).
# Seed-resumable via results/scheduled_at_scale_ckpt.json.
mark "scheduled-at-scale starting"
timeout 12600 python scripts/demo_scheduled_at_scale.py \
  >> results/sched_scale_r5.log 2>&1
mark "scheduled-at-scale done rc=$?"

# (4) Slow-suite cold vs warm timing (VERDICT r4 #6).
mark "slow suite cold (builds cache)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_cold.log 2>&1
mark "slow suite cold rc=$?"
mark "slow suite warm (measures cache benefit)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_warm.log 2>&1
mark "slow suite warm rc=$?"
mark "queue complete"
