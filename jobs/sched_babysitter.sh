#!/bin/bash
# Keeps queue_r5i's stall watchdog honest during the sched run's LEGITIMATE
# silent phases (train_generator_synthetic logs nothing: corpus synth +
# annotate + compile + 2000 steps ~ 5-10 min of log silence per seed).
# Every 2 min: find the demo_scheduled_at_scale.py process via /proc (no
# pgrep -f), read its utime from /proc/<pid>/stat; if it accumulated CPU
# since the last check, touch the log so the watchdog's 15-min idle clock
# resets.  A WEDGED axon stream shows load 0.00 (observed 8/20) => utime
# flat => no touch => the watchdog still kills it.  Exits at the deadline
# or when the sched process is gone for 3 consecutive checks.
set -u
LOG=/root/repo/results/sched_scale_r5.log
DEADLINE=$(date -u -d "today 04:10" +%s)
prev_pid=0 prev_utime=0 gone=0

find_pid() {
  local p
  for p in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "demo_scheduled_at_scale"; then
      basename "$(dirname "$p")"
      return 0
    fi
  done
  return 1
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 120
  pid=$(find_pid) || { gone=$((gone + 1)); [ "$gone" -ge 3 ] && exit 0; continue; }
  gone=0
  utime=$(awk '{print $14 + $15}' "/proc/$pid/stat" 2>/dev/null) || continue
  if [ "$pid" = "$prev_pid" ] && [ "$utime" -gt "$((prev_utime + 50))" ]; then
    touch "$LOG"
  fi
  prev_pid=$pid prev_utime=$utime
done
