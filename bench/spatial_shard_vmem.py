"""Per-shard Mosaic compile + VMEM evidence for the sharded 9x9 path.

Round-5 verdict item 6: the single-chip 9x9 spatial step OOMs scoped
VMEM (338.4 MB vs 128, result/merge/spatial9.json), so the multi-chip
regime is the only way to run it — but no multi-chip hardware exists in
this sandbox. This rig compiles each PER-SHARD Pallas kernel (the exact
ops `shard_map` launches on every device, exposed as
`episode._shard_kernels`) for the REAL TPU at 4 and 8 lane shards: a
successful Mosaic compile proves the per-shard working set fits the
compiler's VMEM budget, and XLA cost analysis records per-kernel flops.
The mesh used for SHAPING is the host's 8 virtual CPU devices (only
`mesh.shape` feeds kernel construction); the compile targets the axon
TPU. Correctness at those shard counts is covered on the CPU mesh by
tests/test_spatial_fused.py (+ the round-5 9x9 short-horizon test).

Usage (TPU): python bench/spatial_shard_vmem.py [--grid 9 --shards 4 8]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=9)
    ap.add_argument("--shards", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--grad", action="store_true",
                    help="also compile the backward (vjp) launches of the"
                         " differentiable kernels")
    args = ap.parse_args()

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_spatial_step import make_fused_spatial_episode

    cfg = dict(num_intersection=args.grid, num_lane=1, lane_length=5.0,
               speed_limit=60.0, cell_length=5.0, policy_length=20,
               signal_length=4, simulation_frequency=30, random_seed=3,
               mode="hybrid", max_num_micro_vehicle_per_lane=10)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    cpu_devs = jax.devices("cpu")
    tpu = jax.devices()[0]
    assert tpu.platform != "cpu", "run on the TPU (axon) backend"

    for n in args.shards:
        mesh = Mesh(np.array(cpu_devs[:n]), ("lane",))
        ep = make_fused_spatial_episode(env, mesh, differentiable=True,
                                        interpret=False)
        rec = {"grid": args.grid, "n_shard": n,
               "lp": ep.geometry["lp"], "kernels": {}}
        for name, (kern, ex) in ep._shard_kernels.items():
            try:
                exd = [jax.device_put(x, tpu) for x in ex]
                lowered = jax.jit(kern).lower(*exd)
                compiled = lowered.compile()
                c = compiled.cost_analysis() or {}
                entry = {"compile": "ok",
                         "flops": float(c.get("flops", 0.0))}
                if args.grad:
                    import jax.numpy as jnp

                    def scal(*a):
                        outs = kern(*a)
                        return sum(jnp.sum(o) for o in outs
                                   if jnp.issubdtype(o.dtype,
                                                     jnp.floating))
                    # grad only w.r.t. the float inputs — some kernels
                    # lead with int32 operands (route ids, counts) —
                    # and only when there IS a float output (the
                    # discrete-arbitration kernel is int->int)
                    fl = tuple(i for i, x in enumerate(ex)
                               if np.issubdtype(np.asarray(x).dtype,
                                                np.floating))
                    outs_sh = jax.eval_shape(kern, *ex)
                    any_f = any(np.issubdtype(o.dtype, np.floating)
                                for o in jax.tree_util.tree_leaves(outs_sh))
                    if fl and any_f:
                        jax.jit(jax.grad(scal, argnums=fl)).lower(
                            *exd).compile()
                        entry["grad_compile"] = "ok"
                    else:
                        entry["grad_compile"] = "no float inputs/outputs"
                rec["kernels"][name] = entry
            except Exception as e:  # noqa: BLE001
                rec["kernels"][name] = {
                    "compile": f"FAIL: {type(e).__name__}: {e}"[:300]}
        rec["all_ok"] = all(v.get("compile") == "ok"
                            for v in rec["kernels"].values())
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
