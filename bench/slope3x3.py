"""3x3 flagship device-slope measurement (T=2400 vs T=600 intercept).

Longer horizons than bench/profile_kernel.py's T-ablation (600/150) so the
slope estimate is ~4x less sensitive to tunnel jitter. Prints min-of-rounds
fwd+bwd and fwd-only slopes.

Usage (TPU): python bench/slope3x3.py [--rounds 3] [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

    def build(policy_length):
        cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
                   speed_limit=60.0, cell_length=5.0,
                   policy_length=policy_length, signal_length=4,
                   simulation_frequency=30, random_seed=3, mode="hybrid",
                   max_num_micro_vehicle_per_lane=10)
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset()
        spec, meta = env.spec, env.meta
        V = env.base_state.micro.position.shape[1]
        R = env.base_state.micro.route.shape[2]
        P = env.data.inj_routes.shape[1]
        P2 = env.base_state.route_pool.shape[1]
        kern = make_fused_itscp_episode(spec, meta, env.config, V, R, P, P2,
                                        differentiable=True,
                                        window=env._fused_win_needed)
        T = env.num_timestep
        d = env.data
        rand = jax.random.uniform(jax.random.PRNGKey(0),
                                  (T, spec.num_lanes))
        a2 = jnp.full((kern.geometry["n_phases"], 9), 0.5)

        def fwd(a):
            r, q = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        d.inj_routes[:, :, :R],
                        env.base_state.route_pool[:, :, :R])
            return r

        return fwd, a2, T

    built = {pl_: build(pl_) for pl_ in (20, 80)}

    def time_one(f, a, reps):
        out = f(a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    for grad in (True, False):
        fns = {}
        for pl_, (fwd, a2, T) in built.items():
            fns[T] = (jax.jit(jax.grad(fwd) if grad else fwd), a2)
        slopes = []
        for _ in range(args.rounds):
            times = {T: time_one(f, a, args.reps)
                     for T, (f, a) in fns.items()}
            slopes.append((times[2400] - times[600]) / 1800.0)
        best = min(slopes)
        print(json.dumps(dict(
            grad=grad, usec_per_step=round(best * 1e6, 2),
            all_rounds=[round(s * 1e6, 2) for s in slopes])), flush=True)


if __name__ == "__main__":
    main()
