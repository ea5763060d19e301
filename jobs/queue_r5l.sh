#!/bin/bash
# Round-5 queue, take 11: queue_r5i's sched run was OOM-KILLED at 02:27 —
# the axon client leaks ~3-4MB of host memory PER DISPATCH, so one process
# accumulates ~130GB across ~40k jitted calls (seed 0 + most of seed 1) on
# a 128GB box.  One seed (~27k dispatches) fits; two don't.  This
# controller therefore RECYCLES the sched python after every banked seed
# (the per-seed ckpt makes that lossless), ADOPTS the attempt-2 python
# already running (its seed-1 progress is not wasted), and pushes the
# sched deadline to 04:15 so all 3 seeds + both quick gates fit:
#   sched seeds (fresh process per seed; stall/OOM/deadline watchdog)
#   -> harvest splice (idempotent) -> quick COLD -> quick WARM -> stop 04:45
#
# Launch DETACHED:
#   setsid nohup bash jobs/queue_r5l.sh > results/queue_r5l.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5l.pid
echo $$ > /tmp/queue_r5i.pid   # bench_precheck follower waits on this file
mark() { echo "[queue_r5l] $(date -u +%H:%M:%S) $*" ; }

SCHED_DEADLINE=$(date -u -d "today 04:25" +%s)
HARD=$(date -u -d "today 04:45" +%s)
left() { echo $(( $1 - $(date +%s) )) ; }
LOG=results/sched_scale_r5.log
TARGET=2

seeds() {
  python -c "
import json
try:
    d = json.load(open('results/scheduled_at_scale_ckpt.json'))
    print(min(len(v) for v in d['scores']))
except Exception:
    print(0)"
}

find_sched_pid() {
  local p
  for p in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "demo_scheduled_at_scale"; then
      basename "$(dirname "$p")"; return 0
    fi
  done
  return 1
}

kill_pid() { kill "$1" 2>/dev/null; sleep 5; kill -9 "$1" 2>/dev/null; }

# watch one sched process; kill it when it banks a seed (heap recycle),
# stalls (axon wedge: log idle >15 min), or hits the deadline (returns 1)
monitor() {
  local pid=$1 base now age
  base=$(seeds)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    if [ "$(seeds)" -gt "$base" ]; then
      mark "seed banked ($(seeds)/$TARGET) - recycling pid $pid (heap reset)"
      kill_pid "$pid"; return 0
    fi
    age=$(( now - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt 900 ]; then
      mark "STALL: log idle ${age}s - killing pid $pid"
      kill_pid "$pid"; return 0
    fi
    if [ "$now" -gt "$SCHED_DEADLINE" ]; then
      mark "SCHED DEADLINE - killing pid $pid"
      kill_pid "$pid"; return 1
    fi
  done
  return 0
}

fails=0
while [ "$(seeds)" -lt "$TARGET" ] && [ "$(date +%s)" -lt "$SCHED_DEADLINE" ]; do
  if pid=$(find_sched_pid); then
    mark "adopting running sched pid $pid ($(seeds)/$TARGET seeds banked)"
  else
    python scripts/demo_scheduled_at_scale.py >> "$LOG" 2>&1 &
    pid=$!
    mark "launched sched pid $pid (resume at $(seeds)/$TARGET seeds)"
  fi
  t0=$(date +%s)
  monitor "$pid" || break
  # crash-loop guard: a process that dies <60s in without banking a seed
  if [ $(( $(date +%s) - t0 )) -lt 60 ]; then
    fails=$((fails + 1))
    [ "$fails" -ge 5 ] && { mark "5 fast failures - giving up on sched"; break; }
    sleep 30
  else
    fails=0
  fi
done
mark "sched block done: $(seeds)/$TARGET seeds banked"

# harvest splice (idempotent: re-invoking with DEMO_SEEDS=<banked> skips
# every banked seed and just writes the DEMO.md section from them)
n=$(seeds)
if [ "$n" -ge 2 ]; then
  DEMO_SEEDS=$n timeout 900 python scripts/demo_scheduled_at_scale.py \
    >> "$LOG" 2>&1
  mark "harvest splice rc=$? (n=$n)"
fi

# quick gates COLD then WARM (VERDICT r4 #6 proxy; cache wiped by the
# 00:57 reset, so COLD is genuine apart from one 24s 3-file targeted run)
if [ "$(left "$HARD")" -gt 1500 ]; then
  mark "quick gate COLD starting"
  SECONDS=0
  timeout $(( $(left "$HARD") - 600 )) \
    python -m pytest tests/ -q -m "not slow" > results/quickgate_cold.log 2>&1
  mark "quick gate COLD rc=$? ${SECONDS}s ($(tail -1 results/quickgate_cold.log))"
fi
if [ "$(left "$HARD")" -gt 600 ]; then
  mark "quick gate WARM starting"
  SECONDS=0
  timeout $(( $(left "$HARD") - 60 )) \
    python -m pytest tests/ -q -m "not slow" > results/quickgate_warm.log 2>&1
  mark "quick gate WARM rc=$? ${SECONDS}s ($(tail -1 results/quickgate_warm.log))"
fi
mark "queue complete"
