"""Probe: split wide banded windows into <=384-wide 128-aligned pieces.

The round-4 banded-dot probe (result/merge/probe_banded.json) found a
cost CLIFF in window width: a [N, win] x [win, M*128] HIGHEST gather
dot (one-hot build included) costs ~0.33 us at win=384 but ~4 us at
win=640 — 12x for 1.67x the one-hot area. 9x9's banded window is 640
(band 151 lane-aligned up to pad 256), right of the cliff; 7x7's is
384, left of it. This probe measures, at 9x9 shapes (Lp=1408, N rows,
M families), the SAME gather computed as

  a) one win=640 dot            (production today)
  b) 384+256 128-aligned pieces (sum of two disjoint-window dots)
  c) one win=512 dot            (cliff localization)
  d) 256+256+128 pieces         (finer split)

All variants are value-identical: each gathered index falls inside
exactly one piece's window, every other piece contributes a zero
one-hot column, and the piece dots are summed.

Usage (TPU): python bench/probe_split.py [--reps 8] [--iters 60]
Prints one JSON line per variant.
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
    ap.add_argument("--iters", type=int, default=2000,
                    help="serial dependent gathers per kernel call")
    ap.add_argument("--N", type=int, default=12)
    ap.add_argument("--M", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    Lp = 1408
    chunk_c = 128
    band = 151
    N, M = args.N, args.M
    st = 128 * 3 - 256  # an interior chunk's 640-window start (chunk j=3)
    lane0 = 128 * 3

    rng = np.random.default_rng(0)
    rows = rng.standard_normal((N, Lp)).astype(np.float32)
    # adjacency-class index rows for chunk j=3: within +-band of the lane
    idx = np.stack([
        np.clip(np.arange(lane0, lane0 + chunk_c) +
                rng.integers(-band, band + 1, chunk_c), 0, Lp - 1)
        for _ in range(M)]).astype(np.int32).reshape(1, M * chunk_c)

    def gather_pieces(rows_ref, idx_ref, out_ref, *, pieces, iters):
        x = rows_ref[...]
        rel_init = idx_ref[...] - st

        def body(_, carry):
            acc, rel0 = carry
            outs = jnp.zeros((N, M * chunk_c), jnp.float32)
            for (p_off, p_w) in pieces:
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (p_w, M * chunk_c), 0) ==
                    (rel0 - p_off)).astype(jnp.float32)
                outs = outs + jnp.dot(
                    x[:, st + p_off:st + p_off + p_w], oh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            # serial dependence so iterations can't overlap
            rel0 = rel0 + (outs[0:1, :] > 1e30).astype(jnp.int32)
            return jnp.maximum(acc, outs), rel0

        acc, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((N, M * chunk_c), -jnp.inf, jnp.float32), rel_init))
        out_ref[...] = acc

    variants = {
        "a_one640": ((0, 640),),
        "b_384_256": ((0, 384), (384, 256)),
        "c_one512_plus128": ((0, 512), (512, 128)),
        "d_256x2_128": ((0, 256), (256, 256), (512, 128)),
    }

    # slope method: time at two iteration counts so the ~24 ms tunnel
    # RTT and launch overhead cancel (see bench/slope3x3.py).
    it_lo, it_hi = args.iters, args.iters * 6
    ja = jnp.asarray(rows)
    ji = jnp.asarray(idx)
    for name, pieces in variants.items():
        ts = {}
        ok = None
        for iters in (it_lo, it_hi):
            fn = pl.pallas_call(
                functools.partial(gather_pieces, pieces=pieces,
                                  iters=iters),
                out_shape=jax.ShapeDtypeStruct((N, M * chunk_c),
                                               jnp.float32),
            )
            jfn = jax.jit(fn)
            out = np.asarray(jfn(ja, ji))
            if ok is None:
                ok = bool(np.array_equal(out, rows[:, idx[0]]))
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jfn(ja, ji).block_until_ready()
                times.append(time.perf_counter() - t0)
            ts[iters] = min(times)
        per_dot = (ts[it_hi] - ts[it_lo]) / (it_hi - it_lo) * 1e6
        print(json.dumps({"variant": name, "pieces": pieces,
                          "usec_per_gather": round(per_dot, 3),
                          "exact": ok, "N": N, "M": M}), flush=True)


if __name__ == "__main__":
    main()
