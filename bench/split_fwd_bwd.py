"""Forward-only vs forward+backward timing of the fused episode at scale.

Splits the large-scene per-step cost (banded_check measures only fwd+bwd)
so the optimization target is evidence-based: if the backward dominates,
attack the replay's gather stream; if the forward does, merge the
same-geometry forward gather families. Usage (TPU)::

    python bench/split_fwd_bwd.py [--grids 7 9] [--wide 1]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, nargs="*", default=[7, 9])
    ap.add_argument("--wide", type=int, default=1)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

    for n in args.grids:
        cfg = dict(num_intersection=n, num_lane=1, lane_length=5.0,
                   speed_limit=20.0, cell_length=5.0, policy_length=18,
                   signal_length=2, simulation_frequency=10, random_seed=3,
                   max_num_micro_vehicle_per_lane=4, mode="hybrid")
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset()
        V = env.base_state.micro.position.shape[1]
        R = env.base_state.micro.route.shape[2]
        P = env.data.inj_routes.shape[1]
        P2 = env.base_state.route_pool.shape[1]
        T = env.num_timestep
        d = env.data
        rand = jax.random.uniform(jax.random.PRNGKey(0),
                                  (T, env.spec.num_lanes))
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=bool(args.wide))
        a2 = jnp.full((kern.geometry["n_phases"], n * n), 0.5)

        def loss(a):
            r, _ = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        d.inj_routes[:, :, :R],
                        env.base_state.route_pool[:, :, :R])
            return r

        def timeit(fn):
            # round-4 tunnel protocol: distinct buffers per rep +
            # host-fetch completion (same-buffer reps are served without
            # re-execution through axon)
            acts = [a2 + 1e-4 * i for i in range(args.reps)]
            np.asarray(jax.tree_util.tree_leaves(fn(acts[0]))[0])
            t0 = time.perf_counter()
            for a in acts:
                np.asarray(jax.tree_util.tree_leaves(fn(a))[0])
            return (time.perf_counter() - t0) / args.reps

        t_f = timeit(jax.jit(loss))
        t_fb = timeit(jax.jit(jax.value_and_grad(loss)))
        print(json.dumps(dict(
            grid=n, T=T, wide=bool(args.wide),
            fwd_only_usec_per_step=round(t_f / T * 1e6, 2),
            fwdbwd_usec_per_step=round(t_fb / T * 1e6, 2),
            bwd_share=round(1 - t_f / t_fb, 3))), flush=True)


if __name__ == "__main__":
    main()
