#!/bin/bash
# Liveness watchdog for reference-scale runs on the tunneled TPU runtime
# (ARCHITECTURE.md lessons 26-27). Restarts scripts/run_fullscale.py when
# the run looks dead across 3 consecutive 60s checks:
#   - run log silent >8 min, AND
#   - tunnel-socket byte counters frozen, AND
#   - the run process consumed <2s of CPU over the last minute.
# The CPU clause is the host-only-phase guard: long merge/save phases hold
# no tunnel socket (empty `ss` output would otherwise read as "frozen")
# and can legitimately go >8 min without a log line, but they burn host
# CPU the whole time. Both observed hang modes (vanished socket; remote
# worker dead behind a live TCP pair) leave the client blocked in a
# device call at ~0%% CPU. Stage artifact caches make a restart ~2 min.
LAST_BYTES=-1
LAST_CPU=-1
MISS=0
while true; do
  sleep 60
  PID=$(pgrep -f "python scripts/run_fullscale.py" | head -1)
  if [ -z "$PID" ]; then MISS=0; LAST_BYTES=-1; LAST_CPU=-1; continue; fi
  BYTES=$(ss -tin | grep -oE "bytes_received:[0-9]+" | cut -d: -f2 | paste -sd+ | bc)
  BYTES=${BYTES:-none}
  # utime+stime in clock ticks (100/s), summed over all threads
  CPU=$(awk '{print $14 + $15}' "/proc/$PID/stat" 2>/dev/null)
  CPU=${CPU:-0}
  CPU_DELTA=$((CPU - LAST_CPU))
  STALE=$(find /tmp/fullscale/logs.log -mmin +8 2>/dev/null | wc -l)
  if [ "$STALE" -gt 0 ] && [ "$BYTES" = "$LAST_BYTES" ] \
     && [ "$LAST_CPU" -ge 0 ] && [ "$CPU_DELTA" -lt 200 ]; then
    MISS=$((MISS+1))
    echo "$(date -u +%H:%M:%S) watchdog: stale log + frozen bytes=$BYTES + idle cpu (d=$CPU_DELTA ticks) (miss $MISS)" >> /tmp/fs_watchdog.log
  else
    MISS=0
  fi
  LAST_BYTES=$BYTES
  LAST_CPU=$CPU
  if [ "$MISS" -ge 3 ]; then
    echo "$(date -u +%H:%M:%S) watchdog: RESTARTING pid $PID" >> /tmp/fs_watchdog.log
    kill "$PID"; sleep 10; kill -9 "$PID" 2>/dev/null
    sleep 75
    cd /root/repo
    setsid nohup python scripts/run_fullscale.py >> /tmp/fullscale_r5.log 2>&1 &
    echo "$(date -u +%H:%M:%S) watchdog: relaunched $!" >> /tmp/fs_watchdog.log
    MISS=0; LAST_BYTES=-1; LAST_CPU=-1
  fi
done
