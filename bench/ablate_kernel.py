"""Per-family build-cost attribution of the fused hybrid ITSCP kernel.

Builds the kernel with each one-hot family (or physics block) stubbed via
``_ablate`` (profiling rig in itscp_hybrid_episode.py) and reports the
device slope (T=600 vs T=150 intercept method) so launch/tunnel overhead
cancels. Values under ablation are numerically wrong; only the deltas
matter.

Usage (TPU): python bench/ablate_kernel.py [--grid 3] [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

    def build_env(policy_length):
        cfg = dict(num_intersection=args.grid, num_lane=1, lane_length=5.0,
                   speed_limit=60.0, cell_length=5.0,
                   policy_length=policy_length, signal_length=4,
                   simulation_frequency=30, random_seed=3, mode="hybrid",
                   max_num_micro_vehicle_per_lane=10)
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset()
        return env

    envs = {600: build_env(20), 150: build_env(5)}

    import numpy as np

    def time_fn(f, a_list, reps):
        # Round-4 axon lessons: block_until_ready does not round-trip and
        # identical-buffer calls are served without re-execution — force
        # completion with a host fetch and cycle DISTINCT inputs per rep.
        np.asarray(f(a_list[-1]))
        times = []
        for a in a_list[:reps]:
            t0 = time.perf_counter()
            np.asarray(f(a))
            times.append(time.perf_counter() - t0)
        return min(times)

    def measure(tag, ablate, grad=True):
        times = {}
        for T, env in envs.items():
            spec, meta, cfg = env.spec, env.meta, env.config
            V = env.base_state.micro.position.shape[1]
            R = env.base_state.micro.route.shape[2]
            P = env.data.inj_routes.shape[1]
            P2 = env.base_state.route_pool.shape[1]
            kern = make_fused_itscp_episode(
                spec, meta, cfg, V, R, P, P2, differentiable=True,
                window=env._fused_win_needed, _ablate=tuple(ablate))
            d = env.data
            rand = jax.random.uniform(jax.random.PRNGKey(0),
                                      (T, spec.num_lanes))
            a2s = [jnp.full((kern.geometry["n_phases"],
                             cfg["num_intersection"] ** 2),
                            0.5 + 1e-4 * i) for i in range(args.reps)]

            def fwd(a):
                r, q = kern(a, d.schedule, d.mroute_next, d.mroute_prev,
                            rand, d.inj_routes[:, :, :R],
                            env.base_state.route_pool[:, :, :R])
                return r

            f = jax.jit(jax.grad(fwd) if grad else fwd)
            times[T] = time_fn(f, a2s, args.reps)
        slope = (times[600] - times[150]) / 450.0
        print(json.dumps(dict(tag=tag, grad=grad,
                              usec_per_step=round(slope * 1e6, 2),
                              t600_ms=round(times[600] * 1e3, 2),
                              t150_ms=round(times[150] * 1e3, 2))),
              flush=True)

    def try_measure(tag, ablate, grad):
        # ablation stubs can break Mosaic's VMEM windowing at 9x9
        # (observed: f32[1408,43648] input window refused) — record the
        # failure and keep attributing the remaining families
        try:
            measure(tag, ablate, grad=grad)
        except Exception as e:  # noqa: BLE001
            print(json.dumps(dict(tag=tag, error=str(e)[:200])), flush=True)

    if args.grid <= 3:
        # dummy-oh build-cost stubs: 3x3-only (the resident block
        # identity is 96-245 MB at 7x7/9x9)
        fams = ["ohb", "walk", "ohg", "ohmh", "ohpk", "oh4", "riemann",
                "idm"]
        alloh = ["ohb", "walk", "ohg", "ohmh", "ohpk", "oh4"]
    else:
        # round-5 scale-safe census stubs: each removes a FAMILY's ops
        # outright (no dummy allocations), values wrong by design —
        # cwalk = the occupancy-compacted walk block, heads = head
        # one-hot + field/route-container picks, rpick = the batched
        # route pick, inj = injection pool one-hot + route shift,
        # conv = destination probes + arbitration + post-arb gathers,
        # croute = the emission-pop / route-container insert
        fams = ["cwalk", "heads", "rpick", "inj", "conv", "croute",
                "riemann", "idm"]
        if not args.fwd_only:
            # replay-path stubs (only live inside the backward kernel's
            # in-kernel vjp): the differentiable leader/sig gathers, the
            # boundary gather, the post-arbitration gathers
            fams += ["bgt", "bbnd", "bconv"]
        alloh = ["cwalk", "heads", "rpick", "inj", "conv", "croute"]
    try_measure("none", [], grad=not args.fwd_only)
    for f in fams:
        try_measure(f"-{f}", [f], grad=not args.fwd_only)
    try_measure("-all_oh", alloh, grad=not args.fwd_only)
    try_measure("-everything", fams, grad=not args.fwd_only)


if __name__ == "__main__":
    main()
