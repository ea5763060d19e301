#!/bin/bash
# Round-5 queue, final shape (replaces queue_r5e's controller while it sat
# in its wait loop; job 1 — the box_roi per-fn train-fit flagship from
# queue_r5d — keeps running and is waited on via $1).
#
# Changes vs r5e: the sandbox reset wiped .jax_compilation_cache/, so the
# first quick gate after job 2 is genuinely COLD — running a second,
# back-to-back WARM quick gate turns VERDICT r4 #6 ("the compilation
# cache's benefit is asserted, not measured") into a measured pair for
# ~15 extra minutes.  The slow-suite warm run could never fit before round
# end (~05:15 UTC), so the tail is: sched-at-scale, then slow suite COLD
# only (validates this session's e2e test additions + rebuilds the cache
# for the next round; its warm counterpart is explicitly deferred).
#
# Launch DETACHED:
#   setsid nohup bash jobs/queue_r5f.sh <job1_pid> \
#     > results/queue_r5f.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5f.pid
mark() { echo "[queue_r5f] $(date -u +%H:%M:%S) $*" ; }

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

# (2b) quick gate COLD (cache dir was wiped by the sandbox reset) — also
# validates this session's cli/main.py + cli/repro.py changes.
mark "quick gate COLD starting"
/usr/bin/time -f "%e s elapsed" timeout 2400 \
  python -m pytest tests/ -q -m "not slow" \
  > results/quickgate_cold.log 2>&1
mark "quick gate COLD rc=$? ($(tail -2 results/quickgate_cold.log | tr '\n' ' '))"

# (2c) quick gate WARM — same command immediately after; the delta is the
# persistent-compilation-cache benefit (VERDICT r4 #6, measured).
mark "quick gate WARM starting"
/usr/bin/time -f "%e s elapsed" timeout 2400 \
  python -m pytest tests/ -q -m "not slow" \
  > results/quickgate_warm.log 2>&1
mark "quick gate WARM rc=$? ($(tail -2 results/quickgate_warm.log | tr '\n' ' '))"

# (3) Scheduled sampling at flagship scale (VERDICT r3 #6 / r4 #5).
# Seed-resumable via results/scheduled_at_scale_ckpt.json.
mark "scheduled-at-scale starting"
timeout 12600 python scripts/demo_scheduled_at_scale.py \
  >> results/sched_scale_r5.log 2>&1
mark "scheduled-at-scale done rc=$?"

# (4) Slow suite COLD (validates e2e additions; rebuilds the slow-test
# cache for next round; warm pair deferred — see header).
mark "slow suite cold starting"
/usr/bin/time -f "%e s elapsed" timeout 9000 \
  python -m pytest tests/ -q -m slow > results/slowsuite_cold.log 2>&1
mark "slow suite cold rc=$? ($(tail -2 results/slowsuite_cold.log | tr '\n' ' '))"
mark "queue complete"
