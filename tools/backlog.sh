#!/bin/bash
# Idempotent TPU backlog runner (round-4 rewrite of tunnel_watch_5x5.sh /
# session4_*.sh, per the round-3 verdict: atomic artifacts, explicit error
# records, skip-completed-on-restart, durable results).
#
#   - every check writes result/wide/NAME.json ATOMICALLY (tmp + mv); a
#     failure writes {"error": ...} instead of leaving an empty file, so
#     "failed" and "never ran" are distinguishable
#   - a step is SKIPPED on restart when its artifact is valid JSON with
#     no "error" key (delete the file to force a rerun)
#   - every completed step ends with a git commit of its artifact, so a
#     mid-run round snapshot cannot strand results untracked
#   - waits for the axon tunnel (devices relay port 8083) before device
#     steps; exits 17 if the tunnel stays dead past WAIT_TUNNEL_S
#
# Usage: tools/backlog.sh [step ...]   (default: all steps, in order)
# Steps: wide_check slope_narrow slope_wide banded5 banded7 banded9 bench
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=result/wide/backlog.log
mkdir -p result/wide
WAIT_TUNNEL_S=${WAIT_TUNNEL_S:-7200}

log() { echo "$(date -u +%FT%TZ) $*" | tee -a "$LOG"; }

tunnel_up() {
  # port check first (cheap), then a REAL device round-trip: the wedge
  # observed 2026-08-21 ~02:00 keeps both relay ports listening while
  # every compile hangs forever — a port probe alone waves steps into
  # 1h timeouts
  timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8083' 2>/dev/null || return 1
  # 360s: a fresh-process probe measured 3m06s END-TO-END on an idle
  # tunnel (remote compile of even a tiny program is minutes when the
  # helper's cache is cold) — a 120s/240s gate false-negatives forever
  timeout 360 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
f = jax.jit(lambda a: (a @ a).sum())
float(f(jnp.ones((128, 128))))
EOF
}

wait_tunnel() {
  local waited=0
  until tunnel_up; do
    [ "$waited" -ge "$WAIT_TUNNEL_S" ] && { log "tunnel dead ${waited}s: giving up"; exit 17; }
    sleep 60; waited=$((waited + 60))
  done
}

done_ok() {  # done_ok FILE -> 0 if FILE is valid JSON with no "error" key
  python - "$1" <<'EOF'
import json, sys
try:
    lines = [l for l in open(sys.argv[1]) if l.strip().startswith("{")]
    d = json.loads(lines[-1])
    sys.exit(1 if "error" in d else 0)
except Exception:
    sys.exit(1)
EOF
}

CUR_STEP="" CUR_OUT="" CUR_PID=""
kill_record() {  # fired on INT/TERM/HUP: an external kill (driver
  # snapshot, session end) must still leave an {"error":...} record
  # instead of a stranded .tmp (round-4 verdict: anneal1w2). SIGKILL is
  # untrappable; rc=137 child OOM-kills take the normal failed-rc path.
  if [ -n "$CUR_STEP" ]; then
    printf '{"error": "%s killed externally", "ts": "%s"}\n' \
      "$CUR_STEP" "$(date -u +%FT%TZ)" > "$CUR_OUT"
    rm -f "$CUR_OUT.tmp"
    [ -n "$CUR_PID" ] && kill "$CUR_PID" 2>/dev/null
    git add "$CUR_OUT" 2>/dev/null
    git commit -q -m "backlog: $CUR_STEP killed externally" 2>/dev/null
  fi
  exit 143
}
trap kill_record INT TERM HUP

run_step() {  # run_step NAME TIMEOUT_S OUT_JSON CMD...
  local name=$1 tmo=$2 out=$3; shift 3
  if done_ok "$out"; then log "$name: already done, skipping"; return 0; fi
  CUR_STEP=$name; CUR_OUT=$out
  local attempt rc=1
  for attempt in 1 2; do
    wait_tunnel
    log "$name: start attempt $attempt ($*)"
    # background + wait so INT/TERM/HUP interrupt the wait and the trap
    # fires immediately (bash defers traps while a foreground child runs)
    timeout "$tmo" "$@" > "$out.tmp" 2> "${out%.json}.err" &
    CUR_PID=$!
    wait "$CUR_PID"; rc=$?
    CUR_PID=""
    if [ "$rc" -eq 0 ]; then
      mv "$out.tmp" "$out"
      log "$name: ok: $(tail -c 300 "$out")"
      break
    fi
    # rc=124: step timeout — the remote compile occasionally wedges
    # forever with the tunnel up (CLAUDE.md gotcha); a fresh process
    # usually clears it, so retry once
    [ "$rc" -ne 124 ] && break
    log "$name: attempt $attempt timed out (suspected compile wedge), retrying"
  done
  CUR_STEP=""; CUR_OUT=""
  if [ "$rc" -ne 0 ]; then
    # progressive rigs (ablate/linesearch) print per-item JSON lines as
    # they go — keep whatever landed before the failure as .partial so a
    # timeout doesn't erase an hour of census data
    [ -s "$out.tmp" ] && mv "$out.tmp" "${out%.json}.partial"
    printf '{"error": "%s failed rc=%d", "ts": "%s"}\n' \
      "$name" "$rc" "$(date -u +%FT%TZ)" > "$out.tmp" && mv "$out.tmp" "$out"
    log "$name: FAILED rc=$rc (stderr tail): $(tail -c 300 "${out%.json}.err")"
  fi
  rm -f "$out.tmp"
  git add "$out" "${out%.json}.err" "${out%.json}.partial" "$LOG" 2>/dev/null
  git commit -q -m "backlog: $name artifact" 2>/dev/null || true
}

STEPS=${*:-"wide_check slope_narrow slope_wide banded5 banded7 banded9 bench"}
mkdir -p result/merge
for s in $STEPS; do
  case $s in
    merge5)       run_step merge5 1800 result/merge/merge5.json \
                    python bench/merge_check.py 5 ;;
    merge7)       run_step merge7 2400 result/merge/merge7.json \
                    python bench/merge_check.py 7 ;;
    merge9)       run_step merge9 3600 result/merge/merge9.json \
                    python bench/merge_check.py 9 ;;
    split79)      run_step split79 3600 result/merge/split79.json \
                    python bench/split_fwd_bwd.py --grids 7 9 --wide 1 ;;
    split79b)     run_step split79b 3600 result/merge/split79b.json \
                    python bench/split_fwd_bwd.py --grids 7 9 --wide 1 ;;
    split5b)      run_step split5b 2400 result/merge/split5b.json \
                    python bench/split_fwd_bwd.py --grids 5 --wide 1 ;;
    sg_check)     run_step sg_check 5400 result/merge/sg_check.json \
                    python bench/sg_check.py 5 9 ;;
    split79sg)    run_step split79sg 3600 result/merge/split79sg.json \
                    env DHTS_SAVE_GATHERS=1 \
                    python bench/split_fwd_bwd.py --grids 7 9 --wide 1 ;;
    split9sgp0)   run_step split9sgp0 2400 result/merge/split9sgp0.json \
                    env DHTS_PEEL_CAP=0 \
                    python bench/split_fwd_bwd.py --grids 9 --wide 1 ;;
    split9align)  run_step split9align 2400 result/merge/split9align.json \
                    env DHTS_LP_ALIGN=512 \
                    python bench/split_fwd_bwd.py --grids 9 --wide 1 ;;
    split79c)     run_step split79c 3600 result/merge/split79c.json \
                    python bench/split_fwd_bwd.py --grids 7 9 --wide 1 ;;
    probe_banded) run_step probe_banded 2400 result/merge/probe_banded.json \
                    python bench/probe_banded.py ;;
    anneal1)      run_step anneal1 3600 result/control/anneal1.json \
                    python tools/anneal_5x5.py 1 ;;
    floor_cma3b)  run_step floor_cma3b 3600 result/control/floor_cma3b.json \
                    python bench/itscp_floor.py --problem 3 --cma per_int ;;
    anneal3w)     run_step anneal3w 3600 result/control/anneal3w.json \
                    python tools/anneal_5x5.py 3 \
                      --warm_start result/control/floor_cma3b.json \
                      --stages 4:150,8:150 \
                      --log_root result/control/itscp_5x5_warm ;;
    floor_cma1b)  run_step floor_cma1b 3600 result/control/floor_cma1b.json \
                    python bench/itscp_floor.py --problem 1 --cma per_int \
                      --cma_evals 2600 ;;
    anneal1w2)    run_step anneal1w2 3600 result/control/anneal1w2.json \
                    python tools/anneal_5x5.py 1 \
                      --warm_start result/control/floor_cma1b.json \
                      --stages 2:120,4:120,8:120 \
                      --log_root result/control/itscp_5x5_warmsoft ;;
    anneal1w)     run_step anneal1w 3600 result/control/anneal1w.json \
                    python tools/anneal_5x5.py 1 \
                      --warm_start result/control/floor_cma1b.json \
                      --stages 4:150,8:150 \
                      --log_root result/control/itscp_5x5_warm ;;
    anneal2w)     run_step anneal2w 3600 result/control/anneal2w.json \
                    python tools/anneal_5x5.py 2 \
                      --warm_start result/control/floor_cma2.json \
                      --stages 4:150,8:150 \
                      --log_root result/control/itscp_5x5_warm ;;
    anneal2)      run_step anneal2 3600 result/control/anneal2.json \
                    python tools/anneal_5x5.py 2 ;;
    anneal3)      run_step anneal3 3600 result/control/anneal3.json \
                    python tools/anneal_5x5.py 3 ;;
    ablate7)      run_step ablate7 5400 result/merge/ablate7.json \
                    python bench/ablate_kernel.py --grid 7 --reps 6 --fwd_only ;;
    spatial7)     run_step spatial7 3600 result/merge/spatial7.json \
                    python bench/spatial_fused_cost.py --grid 7 ;;
    pressure)     run_step pressure 2400 result/merge/pressure.json \
                    python bench/probe_pressure.py ;;
    spatial9)     run_step spatial9 3600 result/merge/spatial9.json \
                    python bench/spatial_fused_cost.py --grid 9 ;;
    floor_cma1)   run_step floor_cma1 3600 result/control/floor_cma1.json \
                    python bench/itscp_floor.py --problem 1 --cma per_int ;;
    floor_cma2)   run_step floor_cma2 3600 result/control/floor_cma2.json \
                    python bench/itscp_floor.py --problem 2 --cma per_int ;;
    floor_cma3)   run_step floor_cma3 3600 result/control/floor_cma3.json \
                    python bench/itscp_floor.py --problem 3 --cma per_int ;;
    # ---- round-5 training campaign (verdict item 2) ----
    ls1)          run_step ls1 4800 result/control/ls1.json \
                    python bench/warm_linesearch.py --problem 1 \
                      --floor result/control/floor_cma1b.json ;;
    ls3)          run_step ls3 4800 result/control/ls3.json \
                    python bench/warm_linesearch.py --problem 3 \
                      --floor result/control/floor_cma3b.json ;;
    compact579)   run_step compact579 5400 result/merge/compact579.json \
                    python bench/compact_check.py 5 7 9 ;;
    compact9)     run_step compact9 5400 result/merge/compact9.json \
                    python bench/compact_check.py 9 ;;
    shardvmem)    run_step shardvmem 4800 result/merge/shard_vmem9.json \
                    python bench/spatial_shard_vmem.py --grid 9 \
                      --shards 4 8 --grad ;;
    ablate9f)     run_step ablate9f 7200 result/merge/ablate9f.json \
                    python bench/ablate_kernel.py --grid 9 --reps 6 --fwd_only ;;
    ablate9g)     run_step ablate9g 9000 result/merge/ablate9g.json \
                    python bench/ablate_kernel.py --grid 9 --reps 6 ;;
    ft1_s*)       seed=${s#ft1_s}  # item 2: iterated gradient fine-tune
                  # of the p1 CMA floor (hard-eval line search, monotone)
                  run_step "$s" 3600 "result/control/$s.json" \
                    python bench/finetune_hard.py --problem 1 \
                      --floor result/control/floor_cma1b.json \
                      --ft_seed "$seed" ;;
    ft3_s*)       seed=${s#ft3_s}
                  run_step "$s" 3600 "result/control/$s.json" \
                    python bench/finetune_hard.py --problem 3 \
                      --floor result/control/floor_cma3b.json \
                      --ft_seed "$seed" ;;
    ft3x)         run_step ft3x 5400 result/control/ft3x.json \
                    python bench/finetune_hard.py --problem 3 \
                      --floor result/control/floor_cma3b.json \
                      --ft_seed 21 --iters 150 --max_stuck 15 ;;
    ft1x)         run_step ft1x 5400 result/control/ft1x.json \
                    python bench/finetune_hard.py --problem 1 \
                      --floor result/control/floor_cma1b.json \
                      --ft_seed 21 --iters 150 --max_stuck 15 \
                      --kick_cells 0.75 ;;
    anneal1_s*)   seed=${s#anneal1_s}  # item 8: seeded replicas of the
                  # cold-anneal p1 stability claim (one seed so far)
                  run_step "$s" 3600 "result/control/$s.json" \
                    python tools/anneal_5x5.py 1 --seed "$seed" \
                      --log_root "result/control/itscp_5x5_anneal_s$seed" ;;
    # ---- end round-5 additions ----
    wide_check)   run_step wide_check 2400 result/wide/wide_check.json \
                    python bench/wide_check.py ;;
    slope_narrow) run_step slope_narrow 2400 result/wide/slope_narrow.json \
                    python bench/slope3x3.py ;;
    slope_wide)   run_step slope_wide 2400 result/wide/slope_wide.json \
                    env DHTS_WIDE_OPS=1 python bench/slope3x3.py ;;
    banded5)      run_step banded5 3600 result/wide/banded_check5.json \
                    python bench/banded_check.py 5 ;;
    banded7)      run_step banded7 3600 result/wide/banded_check7.json \
                    python bench/banded_check.py 7 ;;
    banded9)      run_step banded9 3600 result/wide/banded_check9.json \
                    python bench/banded_check.py 9 ;;
    bench)        run_step bench 5400 result/wide/bench_recheck.json \
                    python bench.py ;;
    *) log "unknown step '$s'"; exit 2 ;;
  esac
done
log "backlog done"
