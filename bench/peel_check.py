"""Device A/B of the walk-hop peel cap (DHTS_PEEL_CAP) at scale.

The round-4 banded-dot probe (result/merge/probe_banded.json) measured
per-dot cost superlinear in window width (~0.33 us at win=384 vs ~5 us
at win>=640), and the fwd/bwd split showed the FORWARD dominating at
7x7/9x9 — so the peeled hops' every-step wide-window gathers (win=896/
1152 at 9x9) are suspects for the large-scene forward floor. Builds the
wide banded kernel at each peel cap, checks reward bit-identity
(peeled vs dense hops are value-identical by construction), and times
fwd+bwd. Usage (TPU): ``python bench/peel_check.py [grid] [caps...]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    caps = [int(c) for c in sys.argv[2:]] or [0, 1, 2, 3]
    cfg = dict(num_intersection=grid, num_lane=1, lane_length=5.0,
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

    def build(cap):
        os.environ["DHTS_PEEL_CAP"] = str(cap)
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=True)
        n_act = env.action_size() // kern.geometry["n_phases"]
        a2 = jnp.full((kern.geometry["n_phases"], n_act), 0.5)

        def loss(a):
            r, _ = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        d.inj_routes[:, :, :R],
                        env.base_state.route_pool[:, :, :R])
            return r

        vg = jax.jit(jax.value_and_grad(loss))
        r, g = vg(a2)
        jax.block_until_ready((r, g))
        t0 = time.perf_counter()
        for _ in range(8):
            r, g = vg(a2)
        jax.block_until_ready((r, g))
        dt = (time.perf_counter() - t0) / 8
        return float(np.asarray(r)), np.asarray(g), dt, \
            kern.geometry.get("n_hop_peel")

    results = {}
    r_ref = g_ref = None
    for cap in caps:
        try:
            r, g, dt, n_pe = build(cap)
        except Exception as e:
            results[str(cap)] = {"error": f"{type(e).__name__}: {e}"[:300]}
            continue
        ok = r_ref is None or (r == r_ref and
                               float(np.abs(g - g_ref).max()) == 0.0)
        if r_ref is None:
            r_ref, g_ref = r, g
        results[str(cap)] = {
            "n_hop_peel": n_pe, "reward": r, "bit_identical_to_first": ok,
            "usec_per_step": round(1e6 * dt / T, 2),
            "steps_per_sec": round(T / dt, 1)}
    print(json.dumps({"grid": grid, "T": T, "caps": results}))


if __name__ == "__main__":
    main()
