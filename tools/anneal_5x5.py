"""Backlog wrapper: staged gate-scale-annealed 5x5 ITSCP training.

Runs ``dhts.apps.control.itscp.run --anneal_gates`` for one problem with
the round-4 training rig (cosine warm restarts per stage, grad clip,
2-episode gradient averaging, 4 fixed held-out eval keys) and prints ONE
JSON summary line (first/best/last eval queue) for tools/backlog.sh.

Usage: python tools/anneal_5x5.py PROBLEM [--stages 1:100,2:100,4:100,8:100]
"""

from __future__ import annotations

import argparse
import contextlib
import glob
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("problem", type=int, choices=[1, 2, 3])
    p.add_argument("--stages", type=str, default="1:100,2:100,4:100,8:100")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--log_root", type=str,
                   default="result/control/itscp_5x5_anneal")
    p.add_argument("--warm_start", type=str, default=None,
                   help="CMA floor JSON with cma_per_int_best_x")
    p.add_argument("--eval_every", type=int, default=0,
                   help="hard-eval cadence in epochs (0 = legacy //10)")
    p.add_argument("--carry", choices=["last", "best"], default="last")
    p.add_argument("--gate_mode", choices=["soft", "st"], default="soft")
    p.add_argument("--seed", type=int, default=21)
    p.add_argument("--ep_per_epoch", type=int, default=2)
    args = p.parse_args()

    from dhts.apps.control.itscp.run import main as run_main

    root = f"{args.log_root}_p{args.problem}"
    t0 = time.time()
    extra = (["--warm_start", args.warm_start] if args.warm_start else [])
    if args.eval_every:
        extra += ["--eval_every", str(args.eval_every)]
    with contextlib.redirect_stdout(sys.stderr):
        run_main(extra +
                 ["--mode", "hybrid", "--problem", str(args.problem),
                  "--n_trial", "1", "--n_intersection", str(args.n),
                  "--n_lane", "1", "--lane_length", "5",
                  "--speed_limit", "60", "--simulation_length", "20",
                  "--signal_length", "4", "--lr", str(args.lr),
                  "--lr_schedule", "cosine",
                  "--grad_clip", str(args.grad_clip),
                  "--ep_per_epoch", str(args.ep_per_epoch),
                  "--n_eval_episode", "4",
                  "--seed", str(args.seed), "--fused_episode",
                  "--carry", args.carry, "--gate_mode", args.gate_mode,
                  "--anneal_gates", args.stages,
                  "--log_root", root])

    runs = sorted(glob.glob(os.path.join(root, "hybrid_*", "trial_0")))
    ev = [float(x) for x in
          open(os.path.join(runs[-1], "eval.txt")).read().split()]
    print(json.dumps({
        "problem": args.problem, "n": args.n, "stages": args.stages,
        "lr": args.lr, "seed": args.seed, "carry": args.carry,
        "gate_mode": args.gate_mode, "eval_every": args.eval_every,
        "evals": len(ev), "first": ev[0], "best": min(ev), "last": ev[-1],
        "reduction_best": round(ev[0] / min(ev), 3),
        "wall_s": round(time.time() - t0, 1), "dir": runs[-1]}))


if __name__ == "__main__":
    main()
