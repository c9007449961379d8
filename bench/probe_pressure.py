"""Probe: does LIVE-SET size explain the 9x9 per-op cost inflation?

The 9x9 wide forward executes ~5.3k inner ops per step at ~21 ns/op
effective, while every isolated per-op probe (elementwise, reduces,
concats, one-hot builds, banded dots) measures 1-5 ns at the same row
shapes — a 10x gap no op class accounts for. Hypothesis: the real step
keeps dozens of [*, Lp] (and [*, W*Lp]) values LIVE simultaneously, so
Mosaic's register allocator spills rows to VMEM between ops; the
isolated probes run 2-4 live values and never spill.

This kernel executes the same arithmetic (2 mul + 1 add per row per
iteration, all rows distinct) while varying ONLY the number of
simultaneously-live [1, Lp] rows carried through the loop. Slope
method over two iteration counts, distinct input buffers per rep,
host-fetch completion (round-4 axon lessons).

Usage (TPU): python bench/probe_pressure.py [--lp 1408]
Prints one JSON line per live-set size.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--lp", type=int, default=1408)
    ap.add_argument("--nlive", type=int, nargs="*",
                    default=[4, 8, 16, 32, 64, 96])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    Lp = args.lp

    def mk(nlive, iters):
        def kern(x_ref, o_ref):
            rows = tuple(x_ref[i:i + 1, :] for i in range(nlive))

            def body(_, rows):
                # every row both read and written each iteration, each
                # row's update depends on its ring neighbour: the whole
                # set stays live across the loop body
                return tuple(rows[i] * 0.9998 + rows[(i + 1) % nlive]
                             * 1e-4 for i in range(nlive))

            rows = jax.lax.fori_loop(0, iters, body, rows)
            acc = rows[0]
            for r in rows[1:]:
                acc = acc + r
            o_ref[...] = acc
        return kern

    out = []
    for nlive in args.nlive:
        try:
            rng = np.random.default_rng(0)
            xs = [jnp.asarray(
                rng.standard_normal((nlive, Lp)).astype(np.float32))
                for _ in range(args.reps)]
            ts = {}
            for iters in (args.iters, args.iters * 5):
                fn = pl.pallas_call(
                    mk(nlive, iters),
                    out_shape=jax.ShapeDtypeStruct((1, Lp), jnp.float32))
                jfn = jax.jit(fn)
                np.asarray(jfn(xs[-1]))
                times = []
                for x in xs:
                    t0 = time.perf_counter()
                    np.asarray(jfn(x))
                    times.append(time.perf_counter() - t0)
                ts[iters] = min(times)
            # 3 vector ops per live row per iteration (mul, mul, add)
            nops = 3 * nlive * args.iters * 4
            per_op = (ts[args.iters * 5] - ts[args.iters]) / nops * 1e9
            rec = {"nlive": nlive, "lp": Lp,
                   "nsec_per_op": round(per_op, 2),
                   "vregs_live": nlive * (Lp // 128)}
        except Exception as e:  # noqa: BLE001
            rec = {"nlive": nlive, "error": str(e)[:160]}
        print(json.dumps(rec), flush=True)
        out.append(rec)


if __name__ == "__main__":
    main()
