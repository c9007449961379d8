"""Benchmark: hybrid-network simulation steps/sec, forward + backward.

Measures the flagship workload from BASELINE.json — the ITSCP hybrid
network (3x3 intersections, 1 lane per arm, 5 m lanes, 600-step episodes at
30 Hz; ``run_itscp_hybrid.sh``) — as the wall-clock rate of differentiable
simulation steps when computing the full episode loss AND its gradient
w.r.t. the signal action (the training hot path).

Baseline: the PyTorch reference's simulation core driven with equivalent
per-step inputs on this machine's CPU measured 3.34 steps/sec fwd+bwd
(144-lane network, 200 steps — the longest horizon its hand-written backward
survives before its own NaN assert fires; see bench/reference_baseline.py,
run 2026-08-16, single-core container). ``vs_baseline`` is ours / reference.

Prints ONE JSON line. ``--smoke`` runs a tiny CPU variant for CI.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_STEPS_PER_SEC = 3.34  # see module docstring for provenance


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU run (CI); not a performance number")
    ap.add_argument("--batch", type=int, default=8,
                    help="scenario batch for the batched-throughput figure")
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args()

    if args.smoke:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1

    if args.smoke:
        cfg = dict(num_intersection=2, num_lane=1, lane_length=5.0,
                   speed_limit=60.0, cell_length=5.0, policy_length=4,
                   signal_length=2, simulation_frequency=10, random_seed=3,
                   mode="hybrid", max_num_micro_vehicle_per_lane=4)
    else:
        # the reference's hybrid preset: run_itscp_hybrid.sh. The headline
        # path is the grid-streamed whole-episode Pallas kernel
        # (use_fused_episode; fwd+bwd in 2 kernels, grad cosine 1.0 vs the
        # scan env). remat/unroll tune the scan fallback used for batching.
        cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
                   speed_limit=60.0, cell_length=5.0, policy_length=20,
                   signal_length=4, simulation_frequency=30, random_seed=3,
                   mode="hybrid", max_num_micro_vehicle_per_lane=10,
                   remat=False, unroll=8, use_fused_episode=True)

    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    T = env.num_timestep
    n_act = env.action_size()
    key = jax.random.PRNGKey(0)

    def loss(action, k):
        return -env.episode(action, True, k).reward

    grad_fn = jax.jit(jax.value_and_grad(loss))
    action = jnp.full((n_act,), 0.5)

    # warmup/compile
    v, g = grad_fn(action, key)
    jax.block_until_ready(g)

    # pipelined timing: enqueue all repeats, block once — measures device
    # throughput, not the host->device dispatch RTT (which through the
    # sandbox's remote-TPU tunnel is ~24 ms/call, comparable to the whole
    # fused episode). Keys are materialized on-device BEFORE the clock
    # starts: a PRNGKey(i) inside the loop is a host->device transfer per
    # repeat, whose tunnel RTT would bill ~5-7 ms/episode to the device.
    reps = max(args.repeats, 3)
    rep_keys = [jax.block_until_ready(jax.random.PRNGKey(i))
                for i in range(reps)]
    t0 = time.perf_counter()
    for k in rep_keys:
        v, g = grad_fn(action, k)
    jax.block_until_ready(g)
    steps_per_sec = T * reps / (time.perf_counter() - t0)

    # batched scenarios: the TPU-native scaling axis the reference lacks
    # (vmapped fused kernel; verified exact vs per-sample episodes)
    B = args.batch
    bgrad = jax.jit(jax.value_and_grad(
        lambda a, ks: jnp.mean(jax.vmap(lambda k: loss(a, k))(ks))))
    keys = jax.random.split(key, B)
    v, g = bgrad(action, keys)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = bgrad(action, keys)
    jax.block_until_ready(g)
    batched_steps_per_sec = T * B * reps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "hybrid ITSCP net sim steps/sec (fwd+bwd)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
        "batched_value": round(batched_steps_per_sec, 2),
        "batch": B,
        "horizon": T,
        "platform": jax.devices()[0].platform,
    }))
    return 0


def _main_with_retry():
    """The sandbox's remote-TPU tunnel occasionally wedges mid-run; a fresh
    process (fresh backend) is the reliable recovery. Re-exec ourselves
    once before giving up so a transient tunnel failure doesn't lose the
    round's benchmark record."""
    import os
    import traceback

    try:
        return main()
    except Exception:
        if os.environ.get("DHTS_BENCH_RETRIED") is None:
            traceback.print_exc()
            print("bench failed; retrying once in a fresh process",
                  file=sys.stderr)
            os.environ["DHTS_BENCH_RETRIED"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise


if __name__ == "__main__":
    sys.exit(_main_with_retry())
