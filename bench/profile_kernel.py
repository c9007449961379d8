"""Empirical ablation profile of the fused hybrid ITSCP kernel on the TPU.

The roofline accounting (dhts/utils/roofline.py) says the kernel runs ~10x
above both its compute and HBM bounds at every scene size — i.e. the time
is going somewhere the analytic model doesn't see. This script measures
where, by timing kernel variants on the real chip:

* forward-only vs fwd+bwd                   (backward share)
* two horizons T                            (per-step slope vs launch cost)
* leader window W in {1, natural}           (window-walk share)
* route capacity R in {8, 32}               (route-container share)
* no-residual forward (save_traj=False) vs residual-saving forward
                                            (HBM streaming share)

Usage (TPU):  python bench/profile_kernel.py [--sizes 3,5,7] [--reps 5]
Each line of output is one JSON record. Timing is pipelined (enqueue all
reps, block once) like bench.py.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="3,5,7")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fast", action="store_true",
                    help="skip the T-ablation and R-ablation variants")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import (leader_window,
                                                      make_fused_itscp_episode)

    def build_env(n, policy_length=20):
        cfg = dict(num_intersection=n, num_lane=1, lane_length=5.0,
                   speed_limit=60.0, cell_length=5.0,
                   policy_length=policy_length, signal_length=4,
                   simulation_frequency=30, random_seed=3, mode="hybrid",
                   max_num_micro_vehicle_per_lane=10)
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset()
        return env

    def time_fn(f, *a, reps):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    def run_variant(env, tag, *, window=None, R=None, grad=True):
        spec, meta, cfg = env.spec, env.meta, env.config
        V = env.base_state.micro.position.shape[1]
        R_full = env.base_state.micro.route.shape[2]
        P = env.data.inj_routes.shape[1]
        P2 = env.base_state.route_pool.shape[1]
        Rk = R_full if R is None else R
        win = env._fused_win_needed if window is None else window
        kern = make_fused_itscp_episode(spec, meta, cfg, V, Rk, P, P2,
                                        differentiable=True, window=win)
        T = env.num_timestep
        L = spec.num_lanes
        n_phases = kern.geometry["n_phases"]
        d = env.data
        inj = d.inj_routes[:, :, :Rk]
        pool = env.base_state.route_pool[:, :, :Rk]
        rand = jax.random.uniform(jax.random.PRNGKey(0), (T, L))
        a2 = jnp.full((n_phases, cfg["num_intersection"] ** 2), 0.5)

        def fwd(a):
            r, q = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        inj, pool)
            return r

        t_compile0 = time.perf_counter()
        if grad:
            f = jax.jit(jax.grad(fwd))
        else:
            f = jax.jit(fwd)
        out = f(a2)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t_compile0
        dt_run = time_fn(f, a2, reps=args.reps)
        rec = dict(tag=tag, grid=cfg["num_intersection"], T=T,
                   Lp=kern.geometry["Lp"], W=win, R=Rk, grad=grad,
                   sec_per_episode=round(dt_run, 5),
                   steps_per_sec=round(T / dt_run, 1),
                   usec_per_step=round(dt_run / T * 1e6, 2),
                   compile_s=round(compile_s, 1))
        print(json.dumps(rec), flush=True)
        return rec

    for n in [int(s) for s in args.sizes.split(",")]:
        env = build_env(n)
        run_variant(env, "fwd_only", grad=False)
        run_variant(env, "fwd_bwd", grad=True)
        if not args.fast:
            run_variant(env, "window_1", window=1, grad=True)
            run_variant(env, "route_R8", R=8, grad=True)
            env_s = build_env(n, policy_length=5)  # T=150
            run_variant(env_s, "fwd_bwd_T150", grad=True)
            run_variant(env_s, "fwd_only_T150", grad=False)


if __name__ == "__main__":
    main()
