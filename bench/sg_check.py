"""Real-Mosaic A/B + identity check of the saved replay-gather path.

Round-5: DHTS_SAVE_GATHERS streams the replay's differentiable gather
VALUES (boundary [6,3Lp], leader gt [2,Lp], sig3 [1,3Lp], post-arb
Gdf [5,2Lp]) as per-step residuals; the backward replay returns them
through ``with_saved`` (custom_vjp) so only each gather's transpose
survives in the backward kernel (census: bgt 38.8 + bbnd 16.4 + bconv
15.0 us/step nominal at 9x9, result/merge/ablate9g.json).

Builds the wide+compact production kernel with the flag OFF then ON in
one process, asserts forward bit-identity and gradient agreement on the
REAL TPU, and times fwd+bwd (tunnel protocol: distinct buffers,
host-fetch completion). Usage: python bench/sg_check.py [grid ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def run_grid(grid):
    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

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

    def build(sg):
        os.environ["DHTS_SAVE_GATHERS"] = "1" if sg else "0"
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=True)
        assert kern.geometry["save_gathers"] == bool(sg)
        n_act = env.action_size() // kern.geometry["n_phases"]
        acts = [jnp.full((kern.geometry["n_phases"], n_act),
                         0.5 + 1e-4 * i) for i in range(8)]

        def loss(a):
            r, _ = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        d.inj_routes[:, :, :R],
                        env.base_state.route_pool[:, :, :R])
            return r

        vg = jax.jit(jax.value_and_grad(loss))
        r, g = vg(acts[0])
        r, g0 = np.asarray(r), np.asarray(g)
        t0 = time.perf_counter()
        for a in acts:
            r2, g = vg(a)
            np.asarray(r2)
        dt = (time.perf_counter() - t0) / len(acts)
        return r, g0, dt

    r0, g0, t0 = build(False)
    out = {"grid": grid, "T": T, "reward": float(r0),
           "steps_per_sec_live": round(T / t0, 1),
           "usec_per_step_live": round(t0 / T * 1e6, 2)}
    try:
        r1, g1, t1 = build(True)
    except Exception as e:  # noqa: BLE001 — live numbers still land
        out.update({"sg_error": f"{type(e).__name__}: {e}"[:400]})
        return out, False
    denom = np.maximum(np.abs(g0), 1e-30)
    max_rel = float((np.abs(g1 - g0) / denom).max())
    ok = bool(r0 == r1 and np.isfinite(g1).all() and
              np.abs(g1 - g0).max() <= 1e-10)
    out.update({
        "fwd_bit_identical": bool(r0 == r1),
        "grad_max_abs_diff": float(np.abs(g0 - g1).max()),
        "grad_max_rel_diff": max_rel,
        "steps_per_sec_saved": round(T / t1, 1),
        "usec_per_step_saved": round(t1 / T * 1e6, 2),
        "sg_speedup": round(t0 / t1, 3),
    })
    return out, ok


def main():
    grids = [int(g) for g in sys.argv[1:]] or [5, 9]
    all_ok = True
    for grid in grids:
        out, ok = run_grid(grid)
        all_ok &= ok
        print(json.dumps(out), flush=True)
    if not all_ok:
        raise SystemExit("save_gathers failed the on-device check")


if __name__ == "__main__":
    main()
