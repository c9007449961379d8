"""Probe 2: MXU pass count, dot width, and reduction costs on the TPU.

probe_oh.py showed a [16->128pad, 256] x [256, 1024] HIGHEST f32 gather
matmul costs ~2.9 us with the one-hot build essentially free, DEFAULT f32
is 26x SLOWER (do not use), and a 256-sublane jnp.sum is 73 us. This probe
pins down the fast path:

  hi_m4 / hi_m1      f32 HIGHEST at M=4 / M=1 width (width scaling)
  hi_m4_row128       f32 HIGHEST, 128 LHS rows (row-tile scaling)
  bf_def_m4 / _hi_   3x-split bf16 LHS x bf16 one-hot, DEFAULT / HIGHEST
  bf_def_m1          split-bf16 at M=1
  two_hi_m2          two dependent HIGHEST M=2 dots (per-dot overhead)
  sum16              jnp.sum over [16, 1024] axis 0 (pick_v idiom)
  sum8               jnp.sum over [8, 1024] axis 0

Usage (TPU): python bench/probe_oh2.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lp", type=int, default=256)
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Lp, N = args.lp, args.rows
    HI = jax.lax.Precision.HIGHEST

    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                  vmem_limit_bytes=100 * 1024 * 1024)

    def run(kernel, n_out, T, reps, n_rows):
        idx = np.random.randint(0, Lp, size=(T, 1, 4 * Lp)).astype(np.int32)
        rows = np.random.randn(n_rows, Lp).astype(np.float32)
        f = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, 1, 4 * Lp), lambda t: (t, 0, 0)),
                      pl.BlockSpec((n_rows, Lp), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((8, n_out), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, n_out), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, n_out), jnp.float32)],
            compiler_params=params,
        )
        fj = jax.jit(f)
        out = fj(idx, rows)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fj(idx, rows)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    def measure(tag, kernel, n_out, n_rows=None):
        n_rows = N if n_rows is None else n_rows
        try:
            t_hi = run(kernel, n_out, 24000, args.reps, n_rows)
            t_lo = run(kernel, n_out, 4000, args.reps, n_rows)
        except Exception as e:
            print(json.dumps(dict(tag=tag, error=str(e)[:160])), flush=True)
            return
        slope = (t_hi - t_lo) / 20000.0
        print(json.dumps(dict(tag=tag, usec_per_iter=round(slope * 1e6, 3),
                              t_hi_ms=round(t_hi * 1e3, 2),
                              t_lo_ms=round(t_lo * 1e3, 2))), flush=True)

    def emit(out_ref, acc, val):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros(acc.shape, acc.dtype)

        r = jnp.sum(val, axis=0, keepdims=True)  # [1, n_out], tiny
        acc[:] = acc[:] + jnp.broadcast_to(r, acc.shape)

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    def oh_f32(idx, cols):
        return (jax.lax.broadcasted_iota(jnp.int32, (Lp, cols), 0) ==
                idx).astype(jnp.float32)

    def split3(x):
        hi = x.astype(jnp.bfloat16)
        r1 = x - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, mid, lo], axis=0)  # [3N, Lp] bf16

    def k_hi_m4(idx_ref, rows_ref, out_ref, acc):
        oh = oh_f32(idx_ref[0], 4 * Lp)
        emit(out_ref, acc, jnp.dot(rows_ref[:], oh, precision=HI,
                                   preferred_element_type=jnp.float32))

    def k_hi_m1(idx_ref, rows_ref, out_ref, acc):
        oh = oh_f32(idx_ref[0, :, :Lp], Lp)
        emit(out_ref, acc, jnp.dot(rows_ref[:], oh, precision=HI,
                                   preferred_element_type=jnp.float32))

    def k_bf_def_m4(idx_ref, rows_ref, out_ref, acc):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, 4 * Lp), 0) ==
              idx_ref[0]).astype(jnp.bfloat16)
        sp = split3(rows_ref[:])
        g = jnp.dot(sp, oh).astype(jnp.float32)
        val = g[:N] + g[N:2 * N] + g[2 * N:]
        emit(out_ref, acc, val)

    def k_bf_hi_m4(idx_ref, rows_ref, out_ref, acc):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, 4 * Lp), 0) ==
              idx_ref[0]).astype(jnp.bfloat16)
        sp = split3(rows_ref[:])
        g = jnp.dot(sp, oh, precision=HI,
                    preferred_element_type=jnp.float32)
        val = g[:N] + g[N:2 * N] + g[2 * N:]
        emit(out_ref, acc, val)

    def k_bf_def_m1(idx_ref, rows_ref, out_ref, acc):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0) ==
              idx_ref[0, :, :Lp]).astype(jnp.bfloat16)
        sp = split3(rows_ref[:])
        g = jnp.dot(sp, oh).astype(jnp.float32)
        val = g[:N] + g[N:2 * N] + g[2 * N:]
        emit(out_ref, acc, val)

    def k_two_hi_m2(idx_ref, rows_ref, out_ref, acc):
        oh1 = oh_f32(idx_ref[0, :, :2 * Lp], 2 * Lp)
        g1 = jnp.dot(rows_ref[:], oh1, precision=HI,
                     preferred_element_type=jnp.float32)
        # second dot depends on the first (serial chain, like the step)
        oh2 = oh_f32(idx_ref[0, :, 2 * Lp:] +
                     (g1[:1, :1] > 1e30).astype(jnp.int32), 2 * Lp)
        g2 = jnp.dot(rows_ref[:], oh2, precision=HI,
                     preferred_element_type=jnp.float32)
        emit(out_ref, acc, g1 + g2)

    def k_sum16(idx_ref, rows_ref, out_ref, acc):
        x = (jax.lax.broadcasted_iota(jnp.int32, (16, 4 * Lp), 0) ==
             idx_ref[0]).astype(jnp.float32)
        emit(out_ref, acc, jnp.sum(x, axis=0, keepdims=True))

    def k_sum8(idx_ref, rows_ref, out_ref, acc):
        x = (jax.lax.broadcasted_iota(jnp.int32, (8, 4 * Lp), 0) ==
             idx_ref[0]).astype(jnp.float32)
        emit(out_ref, acc, jnp.sum(x, axis=0, keepdims=True))

    measure("hi_m4", k_hi_m4, 4 * Lp)
    measure("hi_m1", k_hi_m1, Lp)
    measure("hi_m4_row128", k_hi_m4, 4 * Lp, n_rows=128)
    measure("bf_def_m4", k_bf_def_m4, 4 * Lp)
    measure("bf_hi_m4", k_bf_hi_m4, 4 * Lp)
    measure("bf_def_m1", k_bf_def_m1, Lp)
    measure("two_hi_m2", k_two_hi_m2, 2 * Lp)
    measure("sum16", k_sum16, 4 * Lp)
    measure("sum8", k_sum8, 4 * Lp)


if __name__ == "__main__":
    main()
