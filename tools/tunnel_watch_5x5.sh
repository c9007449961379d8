#!/bin/bash
# Poll the axon TPU tunnel (devices relay port 8083); when it comes back,
# run the round-3 TPU backlog in order, each step bounded and logged:
#   1. bench/wide_check.py — real-Mosaic compile + bit-parity + timing of
#      the wide_ops kernel variant (writes result/wide_check.json)
#   2. run_itscp_5x5.sh problems 1-3 — the beyond-reference-scale training
#      artifact (verdict item 6), with DHTS_WIDE_OPS=1 iff step 1 passed
#      with a speedup
#   3. bench/slope3x3.py narrow + wide — flagship device-slope comparison
#   4. python bench.py — full headline bench re-validation
# Log: result/control/itscp_5x5/launcher.log
set -u
cd "$(dirname "$0")/.."
LOG=result/control/itscp_5x5/launcher.log
mkdir -p result/control/itscp_5x5 result/wide
log() { echo "$(date -u +%FT%TZ) $*" >> "$LOG"; }
log "watcher v2 start (pid $$)"
while true; do
  if timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    sleep 5  # the relay sometimes flaps on restart: double-check
    timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null || \
      { sleep 60; continue; }
    log "tunnel UP; step 1: wide_check"
    timeout 2400 python bench/wide_check.py > result/wide/wide_check.json \
      2> result/wide/wide_check.err
    WC_RC=$?
    log "wide_check exit=$WC_RC: $(tail -c 400 result/wide/wide_check.json)"
    WIDE=0
    if [ $WC_RC -eq 0 ] && python - <<'EOF'
import json, sys
try:
    lines = [l for l in open("result/wide/wide_check.json")
             if l.strip().startswith("{")]
    d = json.loads(lines[-1])
    sys.exit(0 if (d.get("bit_identical") and
                   (d.get("wide_speedup") or 0) > 1.02) else 1)
except Exception:
    sys.exit(1)
EOF
    then WIDE=1; fi
    log "step 2: 5x5 training (DHTS_WIDE_OPS=$WIDE)"
    for p in 1 2 3; do
      log "problem $p start"
      DHTS_WIDE_OPS=$WIDE timeout 10800 ./run_itscp_5x5.sh "$p" >> "$LOG" 2>&1
      log "problem $p exit=$?"
    done
    log "step 3: slope3x3 narrow vs wide"
    timeout 3600 python bench/slope3x3.py > result/wide/slope_narrow.json \
      2>&1
    log "slope narrow exit=$?: $(tail -c 300 result/wide/slope_narrow.json)"
    DHTS_WIDE_OPS=1 timeout 3600 python bench/slope3x3.py \
      > result/wide/slope_wide.json 2>&1
    log "slope wide exit=$?: $(tail -c 300 result/wide/slope_wide.json)"
    log "step 4: full bench"
    timeout 5400 python bench.py > result/wide/bench_recheck.json 2>&1
    log "bench exit=$?: $(tail -c 600 result/wide/bench_recheck.json)"
    log "all steps done; watcher exiting"
    exit 0
  fi
  sleep 60
done
