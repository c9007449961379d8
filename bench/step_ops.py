"""Op-stream composition of the fused ITSCP step (CPU-side analysis).

Histograms the optimized-HLO instructions of the per-step forward and
backward-replay graphs (the same jnp graphs the Pallas kernel traces per
grid iteration) to locate the next op-stacking targets for the flagship
slope work (round-2 verdict item 1). Usage::

    JAX_PLATFORMS=cpu python bench/step_ops.py [--wide] [--grid N] [--top K]

Counts exclude pure data-movement no-ops (parameter/constant/tuple/...)
and report both opcode totals and the dominant opcode+shape rows, since
the slope cost model is "per-issued-op fixed cost" on the VPU.
"""

from __future__ import annotations

import argparse
import collections
import re
import sys


NOISE = {
    "parameter", "constant", "tuple", "get-tuple-element", "copy",
    "bitcast", "after-all",
}


def histogram(hlo: str):
    ops = collections.Counter()
    shapes = collections.Counter()
    fused = collections.Counter()
    # instruction lines look like: "  %name = f32[1,256]{1,0} opcode(...)"
    pat = re.compile(r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = ([a-z0-9]+)\[([\d,]*)\][^ ]* ([a-z\-]+)\(")
    for line in hlo.splitlines():
        m = pat.match(line)
        if not m:
            continue
        dtype, shape, opcode = m.groups()
        if opcode in NOISE:
            continue
        ops[opcode] += 1
        shapes[(opcode, f"{dtype}[{shape}]")] += 1
        if opcode == "fusion":
            fused[f"{dtype}[{shape}]"] += 1
    return ops, shapes


def inner_ops(hlo: str):
    """Count ops INSIDE fusion computations too (the VPU still executes
    them; XLA:CPU fusion boundaries differ from Mosaic's but the inner
    op count tracks the step's arithmetic op stream)."""
    ops = collections.Counter()
    pat = re.compile(r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = ([a-z0-9]+)\[([\d,]*)\][^ ]* ([a-z\-]+)\(")
    for line in hlo.splitlines():
        m = pat.match(line)
        if not m:
            continue
        dtype, shape, opcode = m.groups()
        if opcode in NOISE or opcode == "fusion":
            continue
        ops[(opcode, f"{dtype}[{shape}]")] += 1
    return ops


MLIR_NOISE = {"constant", "return", "func", "call", "custom_call",
              "optimization_barrier"}


def by_line(mlir: str, shape_filter: str | None = None,
            prefer_file: str = "itscp_hybrid_episode.py"):
    """Histogram StableHLO ops by kernel source line. The compiled HLO of
    this jaxlib references a stack-frame table (not inline source lines),
    so attribution uses the PRE-optimization StableHLO printed with
    ``debug_info=True`` — counts are before fusion/CSE, i.e. an upper
    bound per line, good for ranking which step() phases mint the ops.

    ``shape_filter`` matches the HLO-style spelling, e.g. ``f32[1,256]``
    (StableHLO ``tensor<1x256xf32>``)."""
    locdef = re.compile(r"^#loc(\d+) = loc\((.*)\)\s*$")
    table = {}
    for line in mlir.splitlines():
        m = locdef.match(line)
        if m:
            table[m.group(1)] = m.group(2)
    fileref = re.compile(r'"([^"]+\.py)":(\d+)')

    def frames(body, depth=0):
        hits = fileref.findall(body)
        if depth < 4:
            for ref in re.findall(r"#loc(\d+)", body):
                hits += frames(table.get(ref, ""), depth + 1)
        return hits

    def resolve(ref):
        hits = frames(table.get(ref, ""))
        if not hits:
            return "<no-loc>"
        pick = next((h for h in hits if h[0].endswith(prefer_file)),
                    hits[-1])
        return f"{pick[0].rsplit('/', 1)[-1]}:{pick[1]}"

    oppat = re.compile(
        r"= (?:stablehlo|chlo)\.([a-z_]+)[^:]*:[^t]*tensor<([^>]*)>"
        r".*loc\(#loc(\d+)\)")
    ops = collections.Counter()
    for line in mlir.splitlines():
        m = oppat.search(line)
        if not m:
            continue
        opcode, tshape, ref = m.groups()
        if opcode in MLIR_NOISE:
            continue
        if shape_filter:
            dims = tshape.split("x")
            hlo_shape = f"{dims[-1]}[{','.join(dims[:-1])}]"
            if hlo_shape != shape_filter:
                continue
        ops[f"{resolve(ref)} {opcode}" if shape_filter
            else resolve(ref)] += 1
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-line", action="store_true",
                    help="also histogram ops by kernel source line")
    ap.add_argument("--shape", default=None,
                    help="restrict --by-line to one shape, e.g. "
                         "'f32[1,256]'")
    ap.add_argument("--packed", type=int, default=0, metavar="B",
                    help="analyze the PACKED kernel (B episodes "
                         "block-diagonal in the lane axis) instead; "
                         "op counts are per PACK step, so divide by B "
                         "for the per-episode comparison")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

    cfg = dict(num_intersection=args.grid, num_lane=1, lane_length=5.0,
               speed_limit=60.0, cell_length=5.0, policy_length=20,
               signal_length=4, simulation_frequency=30, random_seed=3,
               mode="hybrid", max_num_micro_vehicle_per_lane=10)
    cfg["use_wide_ops"] = args.wide
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    if args.packed:
        env.reset_batch(args.packed, seed=3)
        kern = env.packed_episode_fn().kernel
    else:
        env.reset()
        V = env.base_state.micro.position.shape[1]
        R = env.base_state.micro.route.shape[2]
        P = env.data.inj_routes.shape[1]
        P2 = env.base_state.route_pool.shape[1]
        kern = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=env._fused_win_needed,
            wide_ops=args.wide)
    g = kern.geometry
    print(f"geometry: Lp={g['Lp']} W={g['W']} band={g['band']} "
          f"banded_win={g['banded_win']} episodes={g['episodes']} "
          f"wide={kern.wide_ops}")
    texts = kern.step_hlo()
    for name in ("fwd", "bwd"):
        hlo = texts[name]
        ops, shapes = histogram(hlo)
        inner = inner_ops(hlo)
        print(f"\n===== {name} (wide={args.wide}, grid={args.grid}x{args.grid}) "
              f"top-level ops: {sum(ops.values())}, "
              f"inner arithmetic ops: {sum(inner.values())} =====")
        print("-- top-level opcodes --")
        for k, v in ops.most_common(args.top):
            print(f"{v:5d}  {k}")
        print("-- inner (opcode, shape) --")
        for (op, sh), v in inner.most_common(args.top):
            print(f"{v:5d}  {op:22s} {sh}")
        if args.by_line:
            print(f"-- by source line, pre-opt StableHLO"
                  f"{' (' + args.shape + ')' if args.shape else ''} --")
            for k, v in by_line(texts[name + "_mlir"],
                                args.shape).most_common(args.top):
                print(f"{v:5d}  {k}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
