"""Does ANY soft-gradient direction at the CMA floor improve hard eval?

Round-5 training item: warm-started gradient fine-tunes moved the CMA
per-intersection floor by exactly 0.0 (anneal1w reduction_best 1.0).
Diagnosis candidate: the hard metric is PIECEWISE CONSTANT in the
action (signal-progress grid 1/nsf = 1/120), so sub-cell updates change
nothing, and the soft surrogate's descent direction may or may not
cross cells in a direction that helps.

This probe measures it directly. From the CMA floor action x* (the
warm-start init), for each soft gate scale s it computes the soft-loss
gradient g_s over training keys, then line-searches the HARD metric on
the held-out eval keys (the floor rig's own keys) along -g_s/|g_s|_inf
and -sign(g_s), at steps alpha spanning 0.25-30 progress-grid cells.
If some (s, alpha) beats the floor, fine-tuning is tractable and the lr
should be calibrated to that alpha; if none does, x* is a hard-metric
local min along every soft-gradient direction and the gradient story
needs a different mechanism (e.g. time-varying perturbations).

Usage (TPU): python bench/warm_linesearch.py --problem 1 \
    --floor result/control/floor_cma1b.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import PROBLEMS

    p = argparse.ArgumentParser()
    p.add_argument("--problem", type=int, default=1)
    p.add_argument("--floor", type=str, required=True)
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--seed", type=int, default=21)
    p.add_argument("--scales", type=float, nargs="*",
                   default=[1.0, 4.0, 8.0, 16.0])
    p.add_argument("--alphas", type=float, nargs="*",
                   default=[0.002, 0.004, 0.008, 0.017, 0.033, 0.067,
                            0.125, 0.25])
    p.add_argument("--n_eval", type=int, default=4)
    p.add_argument("--n_grad_keys", type=int, default=4)
    args = p.parse_args()

    with open(args.floor) as f:
        ws = json.load(f)
    x_int = np.asarray(ws["cma_per_int_best_x"], np.float64)

    def mk_env(scale):
        env = ItscpEnv(config=dict(
            num_intersection=args.n, num_lane=1, lane_length=5.0,
            speed_limit=60.0, policy_length=20, signal_length=4,
            mode="hybrid", random_seed=args.seed, use_fused_episode=True,
            soft_gate_scale=scale), schedule_fn=PROBLEMS[args.problem])
        env.reset(seed=args.seed)
        return env

    env = mk_env(1.0)
    lo, hi = env.action_bounds()
    n_phases = env.action_size() // x_int.size
    x0 = jnp.asarray(np.tile(x_int, n_phases), jnp.float32)

    hard = jax.jit(lambda a, k: env._fused_episode_one(False)(
        a, env.data, k).reward)
    eval_keys = [jax.random.fold_in(jax.random.PRNGKey(args.seed + 2), i)
                 for i in range(args.n_eval)]
    # training keys: a DIFFERENT stream than eval (fold_in of seed+1,
    # mirroring the Trainer's split of its training key)
    grad_keys = [jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), i)
                 for i in range(args.n_grad_keys)]

    def ev(a):
        return -float(np.mean([np.asarray(hard(a, k)) for k in eval_keys]))

    nsf = 30 * 4  # simulation_frequency * signal_length
    out = {"problem": args.problem, "n_phases": int(n_phases),
           "floor_queue": ws.get("cma_per_int_eval_queue", None),
           "x0_queue": ev(x0), "box": [float(lo), float(hi)],
           # the hard gate compares a_lane against progress = k/nsf, so
           # the metric only changes when an action crosses a 1/nsf cell
           "grid_cell_action_units": 1.0 / nsf, "lines": []}
    print(json.dumps({"x0_queue": out["x0_queue"],
                      "floor": out["floor_queue"]}), flush=True)

    for s in args.scales:
        envs = mk_env(s)
        soft = jax.jit(jax.grad(lambda a: -jnp.mean(jnp.stack(
            [envs._fused_episode_one()(
                a, envs.data, k, envs.base_state.route_pool).reward
             for k in grad_keys]))))
        g = np.asarray(soft(x0))
        gi = g / max(np.abs(g).max(), 1e-30)
        dirs = {"ninf": gi, "sign": np.sign(g)}
        for dname, d in dirs.items():
            best = (None, None)
            row = {"scale": s, "dir": dname, "evals": {}}
            for a in args.alphas:
                xa = jnp.clip(x0 - a * (hi - lo) * jnp.asarray(d, jnp.float32),
                              lo, hi)
                q = ev(xa)
                row["evals"][str(a)] = round(q, 4)
                if best[0] is None or q < best[0]:
                    best = (q, a)
            row["best_queue"] = round(best[0], 4)
            row["best_alpha"] = best[1]
            row["beats_x0"] = bool(best[0] < out["x0_queue"])
            out["lines"].append(row)
            print(json.dumps(row), flush=True)
    out["best_overall"] = min(r["best_queue"] for r in out["lines"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
