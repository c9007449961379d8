"""Probe: per-op cost of the [1, Lp] elementwise idiom vs alternatives.

The 9x9 wide forward executes ~5.3k arithmetic ops/step, mostly on
[1, 1408] rows (bench/step_ops.py --wide --grid 9), and costs ~124 us
— while the banded gather dots measure only ~0.2 us each
(bench/probe_split.py, slope method). Hypothesis: a [1, Lp] row is
laid out as ceil(Lp/128) vregs with 1-of-8 sublanes occupied, so every
elementwise op costs ~Lp/128 vreg-ops; a "tall" [Lp/128, 128] layout
would pack the same data into ceil(Lp/1024) vregs (~5.5x fewer at
Lp=1408). This probe times a serial dependent chain of mixed
elementwise ops (add/mul/compare/select — the step's mix) at each
candidate shape, slope method (two chain lengths through one
fori_loop so tunnel RTT and launch cost cancel).

Usage (TPU): python bench/probe_rowcost.py
Prints one JSON line per shape.
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
    ap.add_argument("--iters", type=int, default=40000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    shapes = [(1, 256), (1, 1408), (8, 1408), (11, 128), (2, 704),
              (1, 128)]

    def chain(x_ref, out_ref, *, iters):
        x = x_ref[...]

        def body(_, v):
            # 28 dependent elementwise ops per iteration, step-like mix
            for _k in range(4):
                a = v + 1.25
                b = a * 0.75
                m = b > 0.5
                c = jnp.where(m, a, b)
                d = jnp.maximum(c, v)
                e = d - 0.125
                v = jnp.minimum(e, 100.0)
            return v
        out_ref[...] = jax.lax.fori_loop(0, iters, body, x)

    for shape in shapes:
        rng = np.random.default_rng(0)
        # distinct device buffers per rep: the axon plugin does not
        # re-execute a call it has already served for identical buffers
        xs = [jnp.asarray(rng.standard_normal(shape).astype(np.float32))
              for _ in range(args.reps)]
        ts = {}
        for iters in (args.iters, args.iters * 6):
            fn = pl.pallas_call(
                functools.partial(chain, iters=iters),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
            jfn = jax.jit(fn)
            np.asarray(jfn(xs[-1]))
            times = []
            for x in xs:
                t0 = time.perf_counter()
                np.asarray(jfn(x))  # host fetch forces real completion
                times.append(time.perf_counter() - t0)
            ts[iters] = min(times)
        per_op = ((ts[args.iters * 6] - ts[args.iters]) /
                  (args.iters * 5) / 28 * 1e9)
        print(json.dumps({"shape": list(shape),
                          "nsec_per_elementwise_op": round(per_op, 2),
                          "t_lo_ms": round(ts[args.iters] * 1e3, 3),
                          "t_hi_ms": round(ts[args.iters * 6] * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
