#!/bin/bash
# Round-5 queue, take 7: queue_r5g's /usr/bin/time wrapper doesn't exist in
# this image, so both quick gates exited rc=127 WITHOUT RUNNING and the
# controller fell through to sched-at-scale.  This controller kills that
# sched (per-seed resumable; loses only the first minutes), times with
# bash SECONDS, and re-runs the tail in the right order:
#   quick gate COLD -> quick gate WARM -> sched-at-scale (3 seeds) ->
#   slow suite COLD (may truncate at round end; stub/unit coverage of this
#   session's changes already ran green).
#
# Launch DETACHED:
#   setsid nohup bash jobs/queue_r5h.sh > results/queue_r5h.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5h.pid
mark() { echo "[queue_r5h] $(date -u +%H:%M:%S) $*" ; }

# (2b) quick gate COLD (compilation cache wiped by the sandbox reset;
# validates this session's cli/main.py + cli/repro.py changes).
mark "quick gate COLD starting"
SECONDS=0
timeout 2400 python -m pytest tests/ -q -m "not slow" \
  > results/quickgate_cold.log 2>&1
mark "quick gate COLD rc=$? ${SECONDS}s ($(tail -1 results/quickgate_cold.log))"

# (2c) quick gate WARM — the persistent-cache benefit, measured (VERDICT #6).
mark "quick gate WARM starting"
SECONDS=0
timeout 2400 python -m pytest tests/ -q -m "not slow" \
  > results/quickgate_warm.log 2>&1
mark "quick gate WARM rc=$? ${SECONDS}s ($(tail -1 results/quickgate_warm.log))"

# (3) Scheduled sampling at flagship scale (VERDICT r3 #6 / r4 #5).
# Seed-resumable via results/scheduled_at_scale_ckpt.json.
mark "scheduled-at-scale starting"
timeout 12600 python scripts/demo_scheduled_at_scale.py \
  >> results/sched_scale_r5.log 2>&1
mark "scheduled-at-scale done rc=$?"

# (4) Slow suite COLD.
mark "slow suite cold starting"
SECONDS=0
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_cold.log 2>&1
mark "slow suite cold rc=$? ${SECONDS}s ($(tail -1 results/slowsuite_cold.log))"
mark "queue complete"
