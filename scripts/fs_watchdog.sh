#!/bin/bash
# Liveness watchdog for reference-scale runs on the tunneled TPU runtime
# (ARCHITECTURE.md lesson 26). Restarts scripts/run_fullscale.py when the
# run log has been silent >8 min AND tunnel-socket byte counters are
# frozen across 3 consecutive 60s checks — the signature of both observed
# hang modes (vanished socket; remote worker dead behind a live TCP
# pair). Stage artifact caches make the restart cost ~2 min.
LAST_BYTES=-1
MISS=0
while true; do
  sleep 60
  PID=$(pgrep -f "python scripts/run_fullscale.py" | head -1)
  if [ -z "$PID" ]; then MISS=0; LAST_BYTES=-1; continue; fi
  BYTES=$(ss -tin | grep -oE "bytes_received:[0-9]+" | cut -d: -f2 | paste -sd+ | bc)
  STALE=$(find /tmp/fullscale/logs.log -mmin +8 2>/dev/null | wc -l)
  if [ "$STALE" -gt 0 ] && [ "$BYTES" = "$LAST_BYTES" ]; then
    MISS=$((MISS+1))
    echo "$(date -u +%H:%M:%S) watchdog: stale log + frozen bytes=$BYTES (miss $MISS)" >> /tmp/fs_watchdog.log
  else
    MISS=0
  fi
  LAST_BYTES=$BYTES
  if [ "$MISS" -ge 3 ]; then
    echo "$(date -u +%H:%M:%S) watchdog: RESTARTING pid $PID" >> /tmp/fs_watchdog.log
    kill "$PID"; sleep 10; kill -9 "$PID" 2>/dev/null
    sleep 75
    cd /root/repo
    setsid nohup python scripts/run_fullscale.py >> /tmp/fullscale_r5.log 2>&1 &
    echo "$(date -u +%H:%M:%S) watchdog: relaunched $!" >> /tmp/fs_watchdog.log
    MISS=0; LAST_BYTES=-1
  fi
done
