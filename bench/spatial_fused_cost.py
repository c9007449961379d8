"""Per-step cost of the sharded-FUSED episode on a 1-device mesh (TPU).

The composition-overhead figure for the verdict: sharded-fused per-step
cost on one device vs the single-device whole-episode kernel's slope.
Round 2 measured 79.1 us/step (5 kernels + 3 collectives); the restructure
fuses the 1-shard step into 2 kernels with no collectives.

Usage (TPU): python bench/spatial_fused_cost.py [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--grid", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_spatial_step import make_fused_spatial_episode

    def build(policy_length):
        cfg = dict(num_intersection=args.grid, num_lane=1, lane_length=5.0,
                   speed_limit=60.0, cell_length=5.0,
                   policy_length=policy_length, signal_length=4,
                   simulation_frequency=30, random_seed=3, mode="hybrid",
                   max_num_micro_vehicle_per_lane=10)
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset()
        mesh = Mesh(jax.devices()[:1], ("lane",))
        ep = make_fused_spatial_episode(env, mesh, differentiable=True)
        n_act = env.action_size()
        key = jax.random.PRNGKey(0)

        def loss(a):
            return -ep(jnp.full((n_act,), 0.5) * a, key).reward

        return jax.jit(jax.grad(loss)), env.num_timestep

    fns = {}
    Ts = []
    for pl_ in (20, 80):
        f, T = build(pl_)
        fns[T] = f
        Ts.append(T)

    def time_one(f, reps):
        # round-4 axon lessons: cycle DISTINCT inputs and force completion
        # with a host fetch (block_until_ready does not round-trip and
        # identical-buffer calls are served without re-execution)
        a_list = [jnp.float32(1.0 + 1e-4 * i) for i in range(reps + 1)]
        np.asarray(f(a_list[-1]))
        times = []
        for a in a_list[:reps]:
            t0 = time.perf_counter()
            np.asarray(f(a))
            times.append(time.perf_counter() - t0)
        return min(times)

    slopes = []
    for _ in range(3):
        times = {T: time_one(f, args.reps) for T, f in fns.items()}
        slopes.append((times[Ts[1]] - times[Ts[0]]) / (Ts[1] - Ts[0]))
    print(json.dumps(dict(
        kind="sharded_fused_1dev_fwd_bwd", grid=args.grid,
        usec_per_step=round(min(slopes) * 1e6, 2),
        all_rounds=[round(s * 1e6, 2) for s in slopes])), flush=True)


if __name__ == "__main__":
    main()
