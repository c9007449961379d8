"""Probe: per-op device cost of the NON-elementwise op classes at 9x9.

bench/probe_rowcost.py measured the elementwise stream at ~1 ns/op
flat in shape — 5.3k ops explain only ~6 us of the 124 us 9x9 wide
forward, and the banded dots (probe_split.py) only ~17 us. The
remaining suspects from the step histogram (step_ops --wide --grid 9):
30 reduce + 19 reduce-window + 119 concatenate + 102 iota + 6 pad per
step. This probe times each class serially (slope method, host-fetch
forced completion, distinct buffers per rep).

Usage (TPU): python bench/probe_reduce.py
Prints one JSON line per case.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--case", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    Lp = 1408

    def mk(case):
        def kern(x_ref, out_ref, *, iters):
            v = x_ref[...]

            def body(_, v):
                if case == "sum_lanes_1row":
                    s = jnp.sum(v, axis=1, keepdims=True)     # [1,1]
                elif case == "max_lanes_1row":
                    s = jnp.max(v, axis=1, keepdims=True)
                elif case == "sum_lanes_8rows":
                    s = jnp.sum(v, axis=1, keepdims=True)     # [8,1]
                elif case == "cumsum_lanes":
                    s = jnp.cumsum(v, axis=1)
                elif case == "concat_lane_halves":
                    s = jnp.concatenate(
                        [v[:, Lp // 2:], v[:, :Lp // 2]], axis=1)
                elif case == "onehot_640x128":
                    idx = v[0:1, :].astype(jnp.int32)
                    oh = (jax.lax.broadcasted_iota(
                        jnp.int32, (640, 128), 0) == idx).astype(
                        jnp.float32)
                    # fold via a <=8-sublane sum (cheap per the Pallas
                    # lessons), isolating the build cost
                    s = jnp.sum(oh[0:8], axis=0, keepdims=True)
                elif case == "sum_sublanes_8rows":
                    s = jnp.sum(v, axis=0, keepdims=True)     # [1,Lp]
                elif case == "pad_row":
                    s = jnp.pad(v[:, :Lp - 128], ((0, 0), (128, 0)))
                return v * 0.999755859375 + s * 1e-30
            out_ref[...] = jax.lax.fori_loop(0, iters, body, v)
        return kern

    cases = {
        "sum_lanes_1row": (1, Lp), "max_lanes_1row": (1, Lp),
        "sum_lanes_8rows": (8, Lp),
        "cumsum_lanes": (1, Lp),
        "concat_lane_halves": (1, Lp), "onehot_640x128": (1, 128),
        "sum_sublanes_8rows": (8, Lp), "pad_row": (1, Lp),
    }

    if args.case:
        cases = {args.case: cases[args.case]}
    for case, shape in cases.items():
        try:
            rng = np.random.default_rng(0)
            xs = [jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                  for _ in range(args.reps)]
            ts = {}
            for iters in (args.iters, args.iters * 6):
                fn = pl.pallas_call(
                    functools.partial(mk(case), iters=iters),
                    out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
                jfn = jax.jit(fn)
                np.asarray(jfn(xs[-1]))
                times = []
                for x in xs:
                    t0 = time.perf_counter()
                    np.asarray(jfn(x))
                    times.append(time.perf_counter() - t0)
                ts[iters] = min(times)
            per_op = ((ts[args.iters * 6] - ts[args.iters]) /
                      (args.iters * 5) * 1e9)
            print(json.dumps({"case": case,
                              "nsec_per_op": round(per_op, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — e.g. cumsum never lowers
            print(json.dumps({"case": case, "error": str(e)[:160]}),
                  flush=True)


if __name__ == "__main__":
    main()
