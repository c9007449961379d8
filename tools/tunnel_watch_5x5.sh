#!/bin/bash
# Poll the axon TPU tunnel (devices relay port 8083); when it comes back,
# run the round-3 TPU backlog in order, each step bounded and logged:
#   1. bench/wide_check.py — real-Mosaic compile + bit-parity + timing of
#      the wide_ops kernel variant on the 3x3 flagship
#   2. bench/banded_check.py 5 — Mosaic smoke of the BANDED kernel (the
#      per-hop-tier walk windows + windowed wstar gather were written
#      while the tunnel was dead and have never met Mosaic); gates the
#      training runs so a lowering failure can't burn 3x3h
#   3. run_itscp_5x5.sh problems 1-3 — the beyond-reference-scale training
#      artifact (verdict item 6), DHTS_WIDE_OPS=1 iff the banded wide
#      variant passed with a speedup
#   4. bench/slope3x3.py narrow + wide — flagship device-slope comparison
#   5. bench/banded_check.py 7 — 7x7 narrow/wide scaling point
#   6. python bench.py — full headline bench re-validation
# Log: result/control/itscp_5x5/launcher.log
set -u
cd "$(dirname "$0")/.."
# `python bench/foo.py` puts bench/ (not the repo root) on sys.path; the
# dhts package needs the root explicitly. Keep /root/.axon_site (axon
# backend) — never REPLACE PYTHONPATH (CLAUDE.md gotcha).
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=result/control/itscp_5x5/launcher.log
mkdir -p result/control/itscp_5x5 result/wide
log() { echo "$(date -u +%FT%TZ) $*" >> "$LOG"; }
json_field() {  # json_field FILE EXPR  (prints 1/0)
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
log "watcher v3 start (pid $$)"
while true; do
  if timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    sleep 5  # the relay sometimes flaps on restart: double-check
    timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null || \
      { sleep 60; continue; }
    log "tunnel UP; step 1: wide_check (3x3)"
    timeout 2400 python bench/wide_check.py > result/wide/wide_check.json \
      2> result/wide/wide_check.err
    WC_RC=$?
    log "wide_check exit=$WC_RC: $(tail -c 400 result/wide/wide_check.json)"

    log "step 2: banded_check (5x5 Mosaic smoke)"
    timeout 3600 python bench/banded_check.py 5 \
      > result/wide/banded_check5.json 2> result/wide/banded_check5.err
    BC_RC=$?
    log "banded_check5 exit=$BC_RC: $(tail -c 400 result/wide/banded_check5.json)"

    WIDE5=0
    if [ $BC_RC -eq 0 ] && json_field result/wide/banded_check5.json \
        'd.get("fwd_bit_identical") and (d.get("wide_speedup") or 0) > 1.02'
    then WIDE5=1; fi
    if [ $BC_RC -eq 0 ]; then
      log "step 3: 5x5 training (DHTS_WIDE_OPS=$WIDE5)"
      for p in 1 2 3; do
        log "problem $p start"
        DHTS_WIDE_OPS=$WIDE5 timeout 10800 ./run_itscp_5x5.sh "$p" \
          >> "$LOG" 2>&1
        log "problem $p exit=$?"
      done
    else
      log "step 3 SKIPPED: banded Mosaic smoke failed (fix the kernel," \
          "then rerun run_itscp_5x5.sh by hand)"
    fi
    log "step 4: slope3x3 narrow vs wide"
    timeout 3600 python bench/slope3x3.py > result/wide/slope_narrow.json \
      2>&1
    log "slope narrow exit=$?: $(tail -c 300 result/wide/slope_narrow.json)"
    DHTS_WIDE_OPS=1 timeout 3600 python bench/slope3x3.py \
      > result/wide/slope_wide.json 2>&1
    log "slope wide exit=$?: $(tail -c 300 result/wide/slope_wide.json)"
    log "step 5: banded_check (7x7 + 9x9 scaling points)"
    timeout 3600 python bench/banded_check.py 7 \
      > result/wide/banded_check7.json 2> result/wide/banded_check7.err
    log "banded_check7 exit=$?: $(tail -c 400 result/wide/banded_check7.json)"
    timeout 3600 python bench/banded_check.py 9 \
      > result/wide/banded_check9.json 2> result/wide/banded_check9.err
    log "banded_check9 exit=$?: $(tail -c 400 result/wide/banded_check9.json)"
    log "step 6: full bench"
    timeout 5400 python bench.py > result/wide/bench_recheck.json 2>&1
    log "bench exit=$?: $(tail -c 600 result/wide/bench_recheck.json)"
    log "all steps done; watcher exiting"
    exit 0
  fi
  sleep 60
done
