#!/bin/bash
# Round-3 session-4 TPU backlog (tunnel is UP; banded_check 5 already run
# by hand). Ordered so the highest-value artifacts land first if the
# session ends early:
#   1. 5x5 training problem 1 (verdict item 6) — DHTS_WIDE_OPS per the
#      banded_check5 verdict (fwd bit-identical + wide faster)
#   2. wide_check (3x3 flagship Mosaic + bit-parity + timing)
#   3. slope3x3 narrow vs wide (device-slope comparison for the default)
#   4. banded_check 7 / 9 (scaling-table points)
#   5. full bench.py re-validation
#   6. 5x5 training problems 2 and 3
# Log: result/control/itscp_5x5/launcher.log (same as the watcher).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=result/control/itscp_5x5/launcher.log
mkdir -p result/control/itscp_5x5 result/wide
log() { echo "$(date -u +%FT%TZ) $*" >> "$LOG"; }
json_field() {
  python - "$1" "$2" <<'EOF'
import json, sys
try:
    lines = [l for l in open(sys.argv[1]) if l.strip().startswith("{")]
    d = json.loads(lines[-1])
    sys.exit(0 if eval(sys.argv[2], {}, {"d": d}) else 1)
except Exception:
    sys.exit(1)
EOF
}
log "session4 backlog start (pid $$)"
WIDE5=0
if json_field result/wide/banded_check5.json \
    'd.get("fwd_bit_identical") and (d.get("wide_speedup") or 0) > 1.02'
then WIDE5=1; fi
log "step 1: 5x5 training problem 1 (DHTS_WIDE_OPS=$WIDE5)"
DHTS_WIDE_OPS=$WIDE5 timeout 5400 ./run_itscp_5x5.sh 1 >> "$LOG" 2>&1
log "problem 1 exit=$?"
log "step 2: wide_check (3x3)"
timeout 2400 python bench/wide_check.py > result/wide/wide_check.json \
  2> result/wide/wide_check.err
log "wide_check exit=$?: $(tail -c 400 result/wide/wide_check.json)"
log "step 3: slope3x3 narrow vs wide"
timeout 2400 python bench/slope3x3.py > result/wide/slope_narrow.json 2>&1
log "slope narrow exit=$?: $(tail -c 300 result/wide/slope_narrow.json)"
DHTS_WIDE_OPS=1 timeout 2400 python bench/slope3x3.py \
  > result/wide/slope_wide.json 2>&1
log "slope wide exit=$?: $(tail -c 300 result/wide/slope_wide.json)"
log "step 4: banded_check 7 + 9"
timeout 2400 python bench/banded_check.py 7 \
  > result/wide/banded_check7.json 2> result/wide/banded_check7.err
log "banded_check7 exit=$?: $(tail -c 400 result/wide/banded_check7.json)"
timeout 2400 python bench/banded_check.py 9 \
  > result/wide/banded_check9.json 2> result/wide/banded_check9.err
log "banded_check9 exit=$?: $(tail -c 400 result/wide/banded_check9.json)"
log "step 5: full bench"
timeout 5400 python bench.py > result/wide/bench_recheck.json 2>&1
log "bench exit=$?: $(tail -c 600 result/wide/bench_recheck.json)"
log "step 6: 5x5 training problems 2-3 (DHTS_WIDE_OPS=$WIDE5)"
for p in 2 3; do
  DHTS_WIDE_OPS=$WIDE5 timeout 5400 ./run_itscp_5x5.sh "$p" >> "$LOG" 2>&1
  log "problem $p exit=$?"
done
log "session4 backlog done"
