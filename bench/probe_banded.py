"""Per-dot cost scaling of the BANDED chunk gathers on the real TPU.

The 9x9 wide forward issues ~90 banded window dots per step (8 gather
families x 11 chunks). Whether to MERGE families (fewer, wider dots at
the cost of gathering a row-union) or shrink windows depends on how a
single ``[N, win] x [win, M*128]`` HIGHEST dot's cost scales with N
(LHS rows), M (index families) and win (window width) at 9x9 shapes —
the 3x3 probe (bench/probe_oh.py) found cost FLAT in N and M at
Lp=256, which if it held at win=640-1152 would make family-merging a
~proportional dot-count win. This probe measures exactly that grid,
one-hot build included (the banded idiom: iota == (idx - start)).

Usage (TPU): python bench/probe_banded.py [--reps 6]
Prints one JSON line per (win, M, N) combination.
"""

from __future__ import annotations

import argparse
import itertools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--wins", type=int, nargs="*", default=[384, 640, 1152])
    ap.add_argument("--ms", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--ns", type=int, nargs="*", default=[4, 12])
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HI = jax.lax.Precision.HIGHEST
    C = args.chunk

    def make_kernel(win, M, N):
        def kernel(idx_ref, rows_ref, out_ref, acc):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                acc[:] = jnp.zeros(acc.shape, acc.dtype)

            idx = idx_ref[0]  # [1, M*C] already start-relative
            oh = (jax.lax.broadcasted_iota(
                jnp.int32, (win, M * C), 0) == idx).astype(jnp.float32)
            acc[:] = acc[:] + jnp.dot(
                rows_ref[:, :win], oh,
                preferred_element_type=jnp.float32, precision=HI)
            out_ref[:] = acc[:]
        return kernel

    def run(win, M, N, T):
        idx = np.random.randint(0, win, size=(T, 1, M * C)).astype(np.int32)
        rows = np.random.randn(N, win).astype(np.float32)
        f = pl.pallas_call(
            make_kernel(win, M, N),
            grid=(T,),
            in_specs=[pl.BlockSpec((1, 1, M * C), lambda t: (t, 0, 0)),
                      pl.BlockSpec((N, win), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((N, M * C), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, M * C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, M * C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        fj = jax.jit(f)
        jax.block_until_ready(fj(idx, rows))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fj(idx, rows)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps

    for win, M, N in itertools.product(args.wins, args.ms, args.ns):
        t_hi = run(win, M, N, 12000)
        t_lo = run(win, M, N, 2000)
        slope = (t_hi - t_lo) / 10000.0
        print(json.dumps(dict(win=win, M=M, N=N,
                              usec_per_dot=round(slope * 1e6, 3))),
              flush=True)


if __name__ == "__main__":
    main()
