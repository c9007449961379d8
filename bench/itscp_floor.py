"""Hard-mode eval floor probe for the 5x5 ITSCP problems.

Evaluates CONSTANT actions across the action box (plus, optionally, a
trained checkpoint) on the held-out fixed eval keys the Trainer uses, to
separate "the optimizer is stuck" from "the task's reachable floor is
here": if no constant beats the trained controller by much, the plateau
is the task, not the training. Usage::

    python bench/itscp_floor.py [--problem 1] [--n 5] [--ckpt PATH]

``--cma per_int`` additionally runs CMA-ES (gradient-free, so it
optimizes the HARD metric directly — no soft-surrogate gap) over a
per-intersection constant action (dim n², tiled across phases): the
best static signal plan. ``--cma full`` optimizes the full open-loop
``[n_phases, n²]`` action. Both bound the reachable floor much tighter
than the flat-constant sweep — if CMA can't beat the trained
controller, the training plateau is the task, not the optimizer.

Prints one JSON line. (Reference has no counterpart; its presets cap at
3x3 — ``example/control/itscp/run.py``.)
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
    p.add_argument("--n", type=int, default=5, help="grid size")
    p.add_argument("--seed", type=int, default=21)
    p.add_argument("--levels", type=float, nargs="*",
                   default=[0.05, 0.2, 0.35, 0.5, 0.65, 0.8, 0.95])
    p.add_argument("--n_eval", type=int, default=4)
    p.add_argument("--ckpt", type=str, default=None,
                   help="model.msgpack to also evaluate")
    p.add_argument("--cma", choices=["per_int", "full"], default=None,
                   help="CMA-ES floor search on the hard metric")
    p.add_argument("--cma_evals", type=int, default=960)
    args = p.parse_args()

    env = ItscpEnv(config=dict(
        num_intersection=args.n, num_lane=1, lane_length=5.0,
        speed_limit=60.0, policy_length=20, signal_length=4,
        mode="hybrid", random_seed=args.seed, use_fused_episode=True),
        schedule_fn=PROBLEMS[args.problem])
    env.reset(seed=args.seed)
    lo, hi = env.action_bounds()
    hard = jax.jit(lambda a, k: env._fused_episode_one(False)(
        a, env.data, k).reward)
    keys = [jax.random.fold_in(jax.random.PRNGKey(args.seed + 2), i)
            for i in range(args.n_eval)]

    def ev(action):
        return float(np.mean([jax.block_until_ready(hard(action, k))
                              for k in keys]))

    out = {"problem": args.problem, "n": args.n, "lo": lo, "hi": hi}
    flat = {}
    for lv in args.levels:
        a = jnp.full((env.action_size(),), lo + (hi - lo) * lv)
        flat[f"{lv:.2f}"] = -ev(a)
    out["const_eval_queue"] = flat
    out["best_const"] = min(flat.values())

    if args.ckpt:
        from flax import serialization

        from dhts.apps.control.controller import (Controller,
                                                  squash_action)
        obs = env.observe()
        model = Controller(output_size=env.action_size())
        # msgpack_restore avoids needing the opt_state target structure
        state = serialization.msgpack_restore(open(args.ckpt, "rb").read())
        raw = model.apply(state["params"], obs)
        out["ckpt_eval_queue"] = -ev(squash_action(raw, lo, hi))

    if args.cma:
        from dhts.utils.cma_es import CmaEs

        n_int = args.n * args.n
        n_phases = env.action_size() // n_int
        dim = n_int if args.cma == "per_int" else env.action_size()

        def expand(x):  # [B, dim] -> [B, action_size]
            if args.cma == "per_int":
                return jnp.tile(x, (1, n_phases))
            return x

        hard_batch = jax.jit(jax.vmap(
            lambda a, k: env._fused_episode_one(False)(
                a, env.data, k).reward, in_axes=(0, None)))

        def batch_obj(xs):  # minimize mean eval queue across the keys
            a = expand(jnp.asarray(xs, jnp.float32))
            qs = [np.asarray(jax.block_until_ready(hard_batch(a, k)))
                  for k in keys]
            return -np.mean(qs, axis=0)

        x0 = np.full((dim,), lo + (hi - lo) * 0.3)
        es = CmaEs(x0, sigma=0.2 * (hi - lo), lower=lo, upper=hi,
                   seed=args.seed)
        hist, _, best_x = es.optimize(batch_obj, args.cma_evals)
        out[f"cma_{args.cma}_eval_queue"] = float(hist.min())
        out[f"cma_{args.cma}_evals"] = int(hist.size)
        out[f"cma_{args.cma}_dim"] = dim
        # the argmin action itself: lets training warm-start from the
        # CMA solution (fit the controller head to reproduce it)
        out[f"cma_{args.cma}_best_x"] = np.asarray(best_x, np.float64
                                                   ).round(6).tolist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
