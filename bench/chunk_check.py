"""Real-Mosaic A/B of the banded-gather chunk width (round 4).

The 9x9 by-line attribution (result/ops/byline_wide_9x9.txt) puts ~32%
of forward inner ops in the banded chunk loop (gather_multi's per-chunk
slice/where/iota-compare/dot, itscp_hybrid_episode.py:456-470), and the
probe table prices a [640,128] one-hot build at ~141 ns — with 102
iota builds/step that is ~14 us of the 9x9 forward. The binding is
per-op issue latency (round-3/4 evidence), so FEWER, WIDER chunks
should win even though they do more one-hot area. chunk_c must divide
Lp and stay 128-aligned for Mosaic lane slices, so the sweep is
grid-dependent (7x7 Lp=1024: 128/256/512; 9x9 Lp=1408=11x128: 128 only
— widening there needs an Lp repad, see DHTS_LP_ALIGN).

Builds the WIDE production kernel per chunk width in one process,
checks reward bit-identity vs the first build, times fwd+bwd.
Usage (TPU): python bench/chunk_check.py [grid] [chunk ...]
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

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    chunks = [int(c) for c in sys.argv[2:]] or [128, 256, 512]
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

    def build(chunk):
        os.environ["DHTS_BANDED_CHUNK"] = str(chunk)
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=True)
        assert kern.banded, "grid too small: the banded path never engaged"
        # a width that doesn't divide Lp silently falls back to 128 inside
        # the kernel — a sweep must not label that as the requested width
        eff = kern.geometry.get("banded_chunk", chunk)
        if eff != chunk:
            raise ValueError(
                f"chunk {chunk} does not divide Lp: kernel fell back to "
                f"{eff}; not a real measurement")
        n_act = env.action_size() // kern.geometry["n_phases"]
        # distinct action buffers per rep + host-fetch completion: through
        # the axon tunnel block_until_ready does not round-trip and
        # identical buffers are served without re-execution (round-4
        # measurement protocol, CLAUDE.md device lessons)
        acts = [jnp.full((kern.geometry["n_phases"], n_act),
                         0.5 + 1e-4 * i) for i in range(8)]

        def loss(a):
            r, _ = kern(a, d.schedule, d.mroute_next, d.mroute_prev, rand,
                        d.inj_routes[:, :, :R],
                        env.base_state.route_pool[:, :, :R])
            return r

        vg = jax.jit(jax.value_and_grad(loss))
        r, g = vg(acts[0])
        r = np.asarray(r)
        t0 = time.perf_counter()
        for a in acts:
            r2, g = vg(a)
            np.asarray(r2)
        dt = (time.perf_counter() - t0) / 8
        return r, np.asarray(g), dt

    out = {"grid": grid, "T": T, "chunks": {}}
    r_base = g_base = None
    for chunk in chunks:
        try:
            r, g, dt = build(chunk)
            rec = {"fwdbwd_call_s": dt, "usec_per_step": round(dt / T * 1e6, 2),
                   "steps_per_sec": round(T / dt, 1),
                   "finite": bool(np.isfinite(r) and np.isfinite(g).all())}
            if r_base is None:
                r_base, g_base = r, g
            else:
                rec["fwd_bit_identical"] = bool(r == r_base)
                rec["grad_max_rel_diff"] = float(
                    np.abs(g - g_base).max() /
                    max(np.abs(g_base).max(), 1e-30))
            out["chunks"][str(chunk)] = rec
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            out["chunks"][str(chunk)] = {
                "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({str(chunk): out["chunks"][str(chunk)]}),
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
