"""Real-Mosaic validation of the wide_ops kernel variant (round 3).

Builds the 3x3 flagship fused episode twice (wide_ops off/on) on the REAL
TPU, checks the wide variant compiles under Mosaic, asserts bit-identical
reward/queues/action-gradient, and prints per-call wall times for both.
Run when the axon tunnel is up: ``python bench/wide_check.py``. If this
passes and the slope improves (confirm with
``DHTS_WIDE_OPS=1 python bench/slope3x3.py``), flip the DHTS_WIDE_OPS
default in ops/pallas/itscp_hybrid_episode.py to "1".
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

    cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
               speed_limit=60.0, cell_length=5.0, policy_length=20,
               signal_length=4, simulation_frequency=30, random_seed=3,
               mode="hybrid", max_num_micro_vehicle_per_lane=10)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    T = env.num_timestep
    d = env.data
    rand = jax.random.uniform(jax.random.PRNGKey(0), (T, env.spec.num_lanes))

    def build(wide):
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=wide)
        a2 = jnp.full((kern.geometry["n_phases"], 9), 0.5)

        def loss(a):
            r, _ = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        d.inj_routes[:, :, :R],
                        env.base_state.route_pool[:, :, :R])
            return r

        vg = jax.jit(jax.value_and_grad(loss))
        r, g = vg(a2)  # compile (wide=True: the Mosaic lowering check)
        jax.block_until_ready((r, g))
        t0 = time.perf_counter()
        for _ in range(8):
            r, g = vg(a2)
        jax.block_until_ready((r, g))
        dt = (time.perf_counter() - t0) / 8
        return np.asarray(r), np.asarray(g), dt

    r0, g0, t0 = build(False)
    r1, g1, t1 = build(True)
    exact = bool(r0 == r1) and bool(np.array_equal(g0, g1))
    print(json.dumps({
        "T": T, "reward_narrow": float(r0), "reward_wide": float(r1),
        "bit_identical": exact,
        "grad_max_abs_diff": float(np.abs(g0 - g1).max()),
        "fwdbwd_call_s_narrow": t0, "fwdbwd_call_s_wide": t1,
        "wide_speedup": t0 / t1 if t1 > 0 else None,
    }))
    if not exact:
        raise SystemExit("wide_ops output differs from the sequential form")


if __name__ == "__main__":
    main()
