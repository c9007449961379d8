"""Forward-only vs forward+backward SLOPE timing of the fused episode.

Splits the large-scene per-step cost so the optimization target is
evidence-based: if the backward dominates, attack the replay's gather
stream; if the forward does, attack the walk / forward gathers.

Round-5 rewrite: direct per-call timing at short horizons is useless
through the axon tunnel (the mandatory per-rep host fetch costs a
~24-30 ms RTT — at T=180 that is 130+ us/step of pure RTT), so both
figures are the SLOPE between two horizons (T and 3T), where the fixed
launch+RTT cost cancels exactly. Usage (TPU)::

    python bench/split_fwd_bwd.py [--grids 7 9] [--wide 1] [--compact 1]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, nargs="*", default=[7, 9])
    ap.add_argument("--wide", type=int, default=1)
    ap.add_argument("--compact", type=int, default=None,
                    help="force DHTS_COMPACT_WALK for the build")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.compact is not None:
        os.environ["DHTS_COMPACT_WALK"] = str(int(args.compact))

    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

    for n in args.grids:
        dts_f, dts_fb = {}, {}
        geom = None
        for plen in (20, 60):
            cfg = dict(num_intersection=n, num_lane=1, lane_length=5.0,
                       speed_limit=60.0, cell_length=5.0,
                       policy_length=plen, signal_length=4,
                       simulation_frequency=30, random_seed=3,
                       mode="hybrid", max_num_micro_vehicle_per_lane=10)
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
            geom = kern.geometry
            a2 = jnp.full((kern.geometry["n_phases"], n * n), 0.5)

            def loss(a):
                r, _ = kern(a, d.schedule, d.mroute_next, d.mroute_prev,
                            rand, d.inj_routes[:, :, :R],
                            env.base_state.route_pool[:, :, :R])
                return r

            def timeit(fn):
                acts = [a2 + 1e-4 * i for i in range(args.reps)]
                np.asarray(jax.tree_util.tree_leaves(fn(acts[0]))[0])
                times = []
                for a in acts:
                    t0 = time.perf_counter()
                    np.asarray(jax.tree_util.tree_leaves(fn(a))[0])
                    times.append(time.perf_counter() - t0)
                return min(times)

            dts_f[T] = timeit(jax.jit(loss))
            dts_fb[T] = timeit(jax.jit(jax.value_and_grad(loss)))
        Ts = sorted(dts_f)
        sl_f = (dts_f[Ts[1]] - dts_f[Ts[0]]) / (Ts[1] - Ts[0])
        sl_fb = (dts_fb[Ts[1]] - dts_fb[Ts[0]]) / (Ts[1] - Ts[0])
        print(json.dumps(dict(
            grid=n, Ts=Ts, wide=bool(args.wide),
            compact=bool(geom.get("compact_walk")),
            fwd_only_usec_per_step=round(sl_f * 1e6, 2),
            fwdbwd_usec_per_step=round(sl_fb * 1e6, 2),
            bwd_usec_per_step=round((sl_fb - sl_f) * 1e6, 2),
            bwd_share=round(1 - sl_f / sl_fb, 3),
            steps_per_sec=round(1.0 / sl_fb, 1))), flush=True)


if __name__ == "__main__":
    main()
