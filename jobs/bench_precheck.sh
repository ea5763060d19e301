#!/bin/bash
# Follower for queue_r5i: once the queue controller exits (sched + both
# quick gates done), if enough time remains before the round-end driver
# bench (~05:03), run ONE bench.py pass as a pre-check so a regression in
# the capture path is caught while it can still be fixed.  Never overlaps
# the queue (waits on its pid) and never the driver (hard 04:50 cutoff via
# timeout computed from the clock).
#
# Launch DETACHED:
#   setsid nohup bash jobs/bench_precheck.sh > results/bench_precheck.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
QPID=$(cat /tmp/queue_r5i.pid)
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
CUTOFF=$(date -u -d "today 04:50" +%s)
LEFT=$(( CUTOFF - $(date +%s) ))
echo "[bench_precheck] $(date -u +%H:%M:%S) queue done, ${LEFT}s before cutoff"
if [ "$LEFT" -gt 700 ]; then
  timeout "$LEFT" python bench.py
  echo "[bench_precheck] rc=$?"
else
  echo "[bench_precheck] skipped (too close to round end)"
fi
