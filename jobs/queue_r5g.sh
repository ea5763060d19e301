#!/bin/bash
# Round-5 queue, take 6: the combined-flagship run under queue_r5f stalled
# at step 16500/24000 — log idle 20+ min, load 0.00, while a FRESH jax
# client reached the TPU fine.  The axon stream wedged mid-run; the python
# had to be killed and the cell retried.  This controller retries the
# flagship with a STALL WATCHDOG (log mtime idle > 15 min => kill + one
# retry) so a recurrence costs minutes, then runs the r5f tail unchanged.
#
# Launch DETACHED:
#   setsid nohup bash jobs/queue_r5g.sh > results/queue_r5g.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5g.pid
mark() { echo "[queue_r5g] $(date -u +%H:%M:%S) $*" ; }

# run a demo_accuracy_table job with stall detection; caller exports the
# DEMO_* env.  $1 = logfile.  returns the python rc, or 9 on stall-kill.
run_with_watchdog() {
  local log="$1"
  touch "$log"
  python scripts/demo_accuracy_table.py >> "$log" 2>&1 &
  local pid=$!
  local start now age
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    age=$(( now - $(stat -c %Y "$log") ))
    if [ "$age" -gt 900 ]; then
      mark "STALL: $log idle ${age}s — killing pid $pid"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      return 9
    fi
    if [ $(( now - start )) -gt 10800 ]; then
      mark "TIMEOUT after 3h — killing pid $pid"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      return 8
    fi
  done
  wait "$pid"
}

# (2, retried) roi_sim(K=4)+count_embed flagship, per-fn conf train-fit —
# the promotion-decision cell (vs box_roi's 0.663 train-fit result).
# Generator resumes from results/acc_ckpt_flagship_roisim_trainfit.pkl.
export DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine
export DEMO_DMODEL=192 DEMO_LAYERS=3
export DEMO_ROI_SIM=1 DEMO_SIM_HEADS=4 DEMO_COUNT_EMBED=1
export DEMO_PER_FN_CONF=1 DEMO_CONF_FIT=train
export DEMO_OUT=results/flagship_roisim_trainfit.md
for attempt in 1 2; do
  mark "flagship roi_sim+count_embed per-fn train-fit attempt $attempt"
  run_with_watchdog results/flagship_roisim_trainfit.log
  rc=$?
  mark "attempt $attempt rc=$rc"
  [ "$rc" -eq 0 ] && break
done
unset DEMO_SCENES DEMO_EXE_STEPS DEMO_LR_SCHEDULE DEMO_DMODEL DEMO_LAYERS
unset DEMO_ROI_SIM DEMO_SIM_HEADS DEMO_COUNT_EMBED DEMO_PER_FN_CONF
unset DEMO_CONF_FIT DEMO_OUT

# (2b) quick gate COLD (cache wiped by the reset; validates session's CLI
# changes).
mark "quick gate COLD starting"
/usr/bin/time -f "%e s elapsed" timeout 2400 \
  python -m pytest tests/ -q -m "not slow" \
  > results/quickgate_cold.log 2>&1
mark "quick gate COLD rc=$? ($(tail -2 results/quickgate_cold.log | tr '\n' ' '))"

# (2c) quick gate WARM — the persistent-cache benefit, measured (VERDICT #6).
mark "quick gate WARM starting"
/usr/bin/time -f "%e s elapsed" timeout 2400 \
  python -m pytest tests/ -q -m "not slow" \
  > results/quickgate_warm.log 2>&1
mark "quick gate WARM rc=$? ($(tail -2 results/quickgate_warm.log | tr '\n' ' '))"

# (3) Scheduled sampling at flagship scale (VERDICT r3 #6 / r4 #5).
mark "scheduled-at-scale starting"
timeout 12600 python scripts/demo_scheduled_at_scale.py \
  >> results/sched_scale_r5.log 2>&1
mark "scheduled-at-scale done rc=$?"

# (4) Slow suite COLD (validates e2e additions; warm pair deferred).
mark "slow suite cold starting"
/usr/bin/time -f "%e s elapsed" timeout 9000 \
  python -m pytest tests/ -q -m slow > results/slowsuite_cold.log 2>&1
mark "slow suite cold rc=$? ($(tail -2 results/slowsuite_cold.log | tr '\n' ' '))"
mark "queue complete"
