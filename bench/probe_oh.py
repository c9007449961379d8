"""Isolate the cost of a one-hot MXU gather's BUILD on the real TPU.

The fused-episode kernel spends most of its step materializing one-hot
matrices via ``broadcasted_iota(dim=0) == idx_row`` (bench/ablate_kernel.py
puts the whole family at ~6 us of the ~12-15 us/step slope, and the cost
scales with one-hot *area*, not matmul width or precision). This probe
times build variants inside a grid-streamed Pallas kernel, with the index
row streamed from HBM per step so nothing can be hoisted:

  dot_only      resident f32 one-hot, matmul only        (floor)
  iota0         broadcasted_iota dim0 == idx -> f32      (current idiom)
  resident_i32  resident [Lp,Mp] int32 row-id plane == idx
  rowcol        resident [Lp,1] row-id column == idx (broadcast compare)
  f32cmp        resident f32 row-id plane == f32 idx
  build_only    iota0 build consumed by a row-sum (no matmul)
  iota0_default iota0 build + DEFAULT-precision matmul

Usage (TPU): python bench/probe_oh.py [--lp 256] [--m 4] [--rows 16]
"""

from __future__ import annotations

import argparse

import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lp", type=int, default=256)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Lp, M, N = args.lp, args.m, args.rows
    Mp = M * Lp
    HI = jax.lax.Precision.HIGHEST

    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                  vmem_limit_bytes=100 * 1024 * 1024)

    def run(tag, kernel, consts, T, reps):
        idx = np.random.randint(0, Lp, size=(T, 1, Mp)).astype(np.int32)
        rows = np.random.randn(N, Lp).astype(np.float32)
        f = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, 1, Mp), lambda t: (t, 0, 0)),
                      pl.BlockSpec((N, Lp), lambda t: (0, 0))] +
                     [pl.BlockSpec(c.shape, lambda t: tuple([0] * c.ndim))
                      for c in consts],
            out_specs=pl.BlockSpec((N, Mp), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, Mp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, Mp), jnp.float32)],
            compiler_params=params,
        )
        fj = jax.jit(f)
        out = fj(idx, rows, *consts)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fj(idx, rows, *consts)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    def measure(tag, kernel, consts=()):
        t_hi = run(tag, kernel, consts, 24000, args.reps)
        t_lo = run(tag, kernel, consts, 4000, args.reps)
        slope = (t_hi - t_lo) / 20000.0
        print(json.dumps(dict(tag=tag, usec_per_iter=round(slope * 1e6, 3),
                              t2000_ms=round(t_hi * 1e3, 2),
                              t500_ms=round(t_lo * 1e3, 2))), flush=True)

    def acc_write(out_ref, acc, val):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros(acc.shape, acc.dtype)

        acc[:] = acc[:] + val

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    def k_dot_only(idx_ref, rows_ref, oh_ref, out_ref, acc):
        # keeps a data dependence on idx so the step isn't dead
        bias = (idx_ref[0, 0:1, 0] == 0).astype(jnp.float32)
        val = jnp.dot(rows_ref[:], oh_ref[:], precision=HI,
                      preferred_element_type=jnp.float32)
        acc_write(out_ref, acc, val + bias[None])

    def k_iota0(idx_ref, rows_ref, out_ref, acc):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, Mp), 0) ==
              idx_ref[0]).astype(jnp.float32)
        acc_write(out_ref, acc, jnp.dot(rows_ref[:], oh, precision=HI,
                                        preferred_element_type=jnp.float32))

    def k_resident_i32(idx_ref, rows_ref, rid_ref, out_ref, acc):
        oh = (rid_ref[:] == idx_ref[0]).astype(jnp.float32)
        acc_write(out_ref, acc, jnp.dot(rows_ref[:], oh, precision=HI,
                                        preferred_element_type=jnp.float32))

    def k_rowcol(idx_ref, rows_ref, rcol_ref, out_ref, acc):
        oh = (rcol_ref[:, :1] == idx_ref[0]).astype(jnp.float32)
        acc_write(out_ref, acc, jnp.dot(rows_ref[:], oh, precision=HI,
                                        preferred_element_type=jnp.float32))

    def k_f32cmp(idx_ref, rows_ref, ridf_ref, out_ref, acc):
        oh = (ridf_ref[:] == idx_ref[0].astype(jnp.float32)).astype(
            jnp.float32)
        acc_write(out_ref, acc, jnp.dot(rows_ref[:], oh, precision=HI,
                                        preferred_element_type=jnp.float32))

    def k_build_only(idx_ref, rows_ref, out_ref, acc):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, Mp), 0) ==
              idx_ref[0]).astype(jnp.float32)
        acc_write(out_ref, acc, jnp.sum(oh, axis=0, keepdims=True) +
                  jnp.zeros((N, Mp), jnp.float32))

    def k_iota0_default(idx_ref, rows_ref, out_ref, acc):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, Mp), 0) ==
              idx_ref[0]).astype(jnp.float32)
        acc_write(out_ref, acc,
                  jnp.dot(rows_ref[:], oh,
                          preferred_element_type=jnp.float32))

    rid = np.tile(np.arange(Lp, dtype=np.int32)[:, None], (1, Mp))
    rcol = np.tile(np.arange(Lp, dtype=np.int32)[:, None], (1, 128))
    dummy_oh = np.tile(np.eye(Lp, dtype=np.float32), (1, M))

    measure("dot_only", k_dot_only, (dummy_oh,))
    measure("iota0", k_iota0)
    measure("resident_i32", k_resident_i32, (rid,))
    measure("rowcol", k_rowcol, (rcol,))
    measure("f32cmp", k_f32cmp, (rid.astype(np.float32),))
    measure("build_only", k_build_only)
    measure("iota0_default", k_iota0_default)


if __name__ == "__main__":
    main()
