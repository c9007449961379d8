"""Real-Mosaic validation of the BANDED 5x5 kernel (round 3, session 3).

The per-hop-tier banded walk gathers and the windowed differentiable
leader (wstar) gather were developed while the axon tunnel was dead, so
they have never been Mosaic-compiled. This smoke builds the 5x5 hybrid
fused episode (the smallest banded scene, Lp=512) narrow and wide,
compiles fwd+bwd on the REAL TPU, checks rewards/gradients are finite and
narrow-vs-wide bit-identical on the forward, and prints per-call wall
times for the scaling table. Run when the tunnel is up:
``python bench/banded_check.py [grid]``.

Bit-level parity vs the scan env is already covered on CPU
(tests/test_itscp_hybrid_fused.py::test_banded_5x5_matches_scan and
::test_wide_ops_7x7_hop1_banded_bit_identical); the TPU-only risk this
script retires is the Mosaic lowering itself.
"""

from __future__ import annotations

import json
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

    def build(wide):
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=wide)
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
        r = np.asarray(r)
        # round-4 tunnel protocol: identical device buffers are served
        # WITHOUT re-execution through axon and block_until_ready does
        # not round-trip, so the old same-buffer loop overstated
        # throughput ~20% (the banded_check-vs-bench gap the round-4
        # verdict flagged). Distinct buffers + host-fetch completion.
        acts = [a2 + 1e-4 * i for i in range(8)]
        for a in acts[:1]:
            np.asarray(vg(a)[0])
        t0 = time.perf_counter()
        for a in acts:
            r2, g = vg(a)
            np.asarray(r2)
        dt = (time.perf_counter() - t0) / 8
        return r, np.asarray(g), dt

    r0, g0, t0 = build(False)
    out = {"grid": grid, "T": T, "reward_narrow": float(r0),
           "fwdbwd_call_s_narrow": t0, "steps_per_sec_narrow": T / t0}
    try:
        r1, g1, t1 = build(True)
    except Exception as e:  # narrow numbers still land in the record
        out.update({"wide_error": f"{type(e).__name__}: {e}"[:400],
                    "finite": bool(np.isfinite(r0) and
                                   np.isfinite(g0).all()),
                    "fwd_bit_identical": False})
        print(json.dumps(out))
        raise SystemExit("wide banded build failed Mosaic; narrow ok")
    finite = bool(np.isfinite(r0) and np.isfinite(g0).all() and
                  np.isfinite(r1) and np.isfinite(g1).all())
    exact_fwd = bool(r0 == r1)
    out.update({
        "reward_wide": float(r1),
        "finite": finite, "fwd_bit_identical": exact_fwd,
        "grad_max_rel_diff": float(np.abs(g0 - g1).max() /
                                   max(np.abs(g0).max(), 1e-30)),
        "fwdbwd_call_s_wide": t1,
        "steps_per_sec_wide": T / t1,
        "wide_speedup": t0 / t1 if t1 > 0 else None,
    })
    print(json.dumps(out))
    if not (finite and exact_fwd):
        raise SystemExit("banded kernel failed the on-device check")


if __name__ == "__main__":
    main()
