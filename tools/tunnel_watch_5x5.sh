#!/bin/bash
# Poll the axon TPU tunnel (devices relay port 8083); when it comes back,
# launch the 5x5 beyond-reference-scale training runs (run_itscp_5x5.sh)
# once, bounded per-problem so a re-wedged tunnel can't hang forever.
# Log: result/control/itscp_5x5/launcher.log
set -u
cd "$(dirname "$0")/.."
LOG=result/control/itscp_5x5/launcher.log
mkdir -p result/control/itscp_5x5
echo "$(date -u +%FT%TZ) watcher start (pid $$)" >> "$LOG"
while true; do
  if timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    # Double-check 5s later: the relay sometimes flaps on restart.
    sleep 5
    if timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null; then
      echo "$(date -u +%FT%TZ) tunnel UP; launching 5x5 problems" >> "$LOG"
      for p in 1 2 3; do
        echo "$(date -u +%FT%TZ) problem $p start" >> "$LOG"
        timeout 10800 ./run_itscp_5x5.sh "$p" >> "$LOG" 2>&1
        echo "$(date -u +%FT%TZ) problem $p exit=$?" >> "$LOG"
      done
      echo "$(date -u +%FT%TZ) all problems done; watcher exiting" >> "$LOG"
      exit 0
    fi
  fi
  sleep 60
done
