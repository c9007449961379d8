#!/bin/bash
# Round-3 session-4 stage 2: runs after the stage-1 backlog (waits on its
# pid) with the wide_ops Mosaic fixes in the tree.
#   1. 5x5 problem-1 LONG run (400 episodes) — the >=2x eval artifact
#      (the 100-episode run ended at 86.9 -> 62.5, still improving)
#   2. banded_check 5/7/9 — narrow scaling numbers + wide Mosaic verdict
#   3. wide_check (3x3) + slope3x3 wide
# Log: result/control/itscp_5x5/launcher.log
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=result/control/itscp_5x5/launcher.log
log() { echo "$(date -u +%FT%TZ) $*" >> "$LOG"; }
if [ -f /tmp/backlog.pid ]; then
  P=$(cat /tmp/backlog.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 20; done
fi
log "stage2 start (pid $$)"
log "stage2 step 1: 5x5 problem 1 long run (400 episodes, narrow)"
timeout 5400 python -m dhts.apps.control.itscp.run --mode=hybrid \
  --problem=1 --n_trial=1 --n_intersection=5 --n_lane=1 --lane_length=5 \
  --speed_limit=60 --simulation_length=20 --signal_length=4 \
  --n_episode=400 --lr=1e-4 --seed=21 --fused_episode \
  --log_root=result/control/itscp_5x5_long >> "$LOG" 2>&1
log "long p1 exit=$?"
for g in 5 7 9; do
  log "stage2 step 2: banded_check $g"
  timeout 2400 python bench/banded_check.py $g \
    > result/wide/banded_check$g.json 2> result/wide/banded_check$g.err
  log "banded_check$g exit=$?: $(tail -c 400 result/wide/banded_check$g.json)"
done
log "stage2 step 3: wide_check + slope wide"
timeout 2400 python bench/wide_check.py > result/wide/wide_check.json \
  2> result/wide/wide_check.err
log "wide_check exit=$?: $(tail -c 400 result/wide/wide_check.json)"
DHTS_WIDE_OPS=1 timeout 2400 python bench/slope3x3.py \
  > result/wide/slope_wide.json 2>&1
log "slope wide exit=$?: $(tail -c 300 result/wide/slope_wide.json)"
log "stage2 done"
