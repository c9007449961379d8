"""Real-Mosaic A/B of DHTS_MERGE_FWD_GATHERS (round 4).

The merged forward gather (walk hop 0 + leader latch, boundary ghosts,
signal lookups, event destination probes through ONE banded gather_multi
call — 44 -> 11 chunk dots/step at 5x5-9x9) is bit-identical on CPU
(banded-5x5-vs-scan exact with the flag on). This script retires the
remaining risks on the REAL TPU: the Mosaic lowering of the 10-row
merged gather, and whether fewer-but-wider dots actually buy wall time
(round-3 evidence says the binding is per-op issue latency, so they
should). Builds the WIDE banded kernel with the flag off then on in one
process, checks reward bit-identity and exact gradient agreement, and
times fwd+bwd. Run when the tunnel is up:
``python bench/merge_check.py [grid]``.
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

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 5
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

    def build(merge):
        os.environ["DHTS_MERGE_FWD_GATHERS"] = "1" if merge else "0"
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=True)
        assert kern.banded, "grid too small: the banded path never engaged"
        n_act = env.action_size() // kern.geometry["n_phases"]
        a2 = jnp.full((kern.geometry["n_phases"], n_act), 0.5)

        def loss(a):
            r, _ = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        d.inj_routes[:, :, :R],
                        env.base_state.route_pool[:, :, :R])
            return r

        vg = jax.jit(jax.value_and_grad(loss))
        r, g = vg(a2)  # compile: the Mosaic lowering check
        jax.block_until_ready((r, g))
        t0 = time.perf_counter()
        for _ in range(8):
            r, g = vg(a2)
        jax.block_until_ready((r, g))
        dt = (time.perf_counter() - t0) / 8
        return np.asarray(r), np.asarray(g), dt

    r0, g0, t0 = build(False)
    out = {"grid": grid, "T": T, "reward_unmerged": float(r0),
           "fwdbwd_call_s_unmerged": t0, "steps_per_sec_unmerged": T / t0}
    try:
        r1, g1, t1 = build(True)
    except Exception as e:  # unmerged numbers still land in the record
        out.update({"merge_error": f"{type(e).__name__}: {e}"[:400],
                    "finite": bool(np.isfinite(r0) and
                                   np.isfinite(g0).all()),
                    "fwd_bit_identical": False})
        print(json.dumps(out))
        raise SystemExit("merged banded build failed Mosaic; unmerged ok")
    finite = bool(np.isfinite(r0) and np.isfinite(g0).all() and
                  np.isfinite(r1) and np.isfinite(g1).all())
    exact_fwd = bool(r0 == r1)
    out.update({
        "reward_merged": float(r1),
        "finite": finite, "fwd_bit_identical": exact_fwd,
        "grad_max_rel_diff": float(np.abs(g0 - g1).max() /
                                   max(np.abs(g0).max(), 1e-30)),
        "fwdbwd_call_s_merged": t1,
        "steps_per_sec_merged": T / t1,
        "merge_speedup": t0 / t1 if t1 > 0 else None,
    })
    print(json.dumps(out))
    if not (finite and exact_fwd):
        raise SystemExit("merged kernel failed the on-device check")


if __name__ == "__main__":
    main()
