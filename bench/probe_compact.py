"""Isolate which compact-walk construct crashes Mosaic at 9x9 shapes.

The compact walk compiles and runs bit-identically at 5x5 (Lp=512) and
7x7 (Lp=1024, hop width 3712) but the 9x9 (Lp=1408, width 3456) build
dies in remote-compile with HTTP 500 (tpu_compile_helper exit 1) —
result/merge/compact579.json. This probe compiles each construct of the
compact block as a standalone kernel at the 9x9 shapes and reports
which one(s) fail. Run on the TPU: python bench/probe_compact.py
[Lp nWc]
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    Lp = int(pos[0]) if pos else 1408
    nWc = int(pos[1]) if len(pos) > 1 else 27
    R, S = 32, 128
    HI = jax.lax.Precision.HIGHEST

    lt = (np.arange(Lp, dtype=np.int32)[:, None] <
          np.arange(Lp, dtype=np.int32)[None]).astype(np.float32)

    def k_rank(needs_ref, lt_ref, o_ref):
        # prefix-rank dot [1,Lp]x[Lp,Lp]
        o_ref[:] = jnp.dot(needs_ref[:], lt_ref[:],
                           preferred_element_type=jnp.float32,
                           precision=HI)

    def k_soht(rank_ref, o_ref):
        # slot one-hot build [S, Lp]
        r = rank_ref[:].astype(jnp.int32)
        o_ref[:] = ((jax.lax.broadcasted_iota(jnp.int32, (S, Lp), 0) == r)
                    & (r < S)).astype(jnp.float32)

    def k_pack(x_ref, soht_ref, o_ref):
        # transposed-RHS compaction dot [R,Lp] . [S,Lp]^T
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], soht_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)

    def k_pick(route_ref, ridx_ref, o_ref):
        # compact route pick: [R, nWc*S] compare + sublane sum
        ridx = ridx_ref[:].astype(jnp.int32)
        j_cat = jnp.concatenate([ridx + 1 + o for o in range(nWc)], axis=1)
        okj = (j_cat >= 0) & (j_cat < R)
        ohr = ((jax.lax.broadcasted_iota(jnp.int32, (R, nWc * S), 0) ==
                j_cat) & okj).astype(jnp.float32)
        ent = jnp.sum(jnp.concatenate([route_ref[:]] * nWc, axis=1) * ohr,
                      axis=0, keepdims=True)
        o_ref[:] = jnp.where(okj, ent, -1.0)

    def k_gather(rows_ref, wl_ref, o_ref):
        # the big hop gather: [1408, nWc*128] one-hot + [5, Lp] dot
        wl = wl_ref[:].astype(jnp.int32)
        ohw = (jax.lax.broadcasted_iota(jnp.int32, (Lp, nWc * S), 0) ==
               wl).astype(jnp.float32)
        o_ref[:] = jnp.dot(rows_ref[:], ohw,
                           preferred_element_type=jnp.float32, precision=HI)

    def k_scatter(vals_ref, soht_ref, o_ref):
        o_ref[:] = jnp.dot(vals_ref[:], soht_ref[:],
                           preferred_element_type=jnp.float32, precision=HI)

    rng = np.random.default_rng(0)
    needs = (rng.uniform(size=(1, Lp)) < 0.01).astype(np.float32)
    rank = np.cumsum(needs) - needs
    soht = np.zeros((S, Lp), np.float32)
    route = rng.integers(-1, Lp, size=(R, S)).astype(np.float32)
    ridx = rng.integers(0, R, size=(1, S)).astype(np.float32)
    rows5 = rng.uniform(size=(5, Lp)).astype(np.float32)
    wl = rng.integers(-1, Lp, size=(1, nWc * S)).astype(np.float32)
    vals = rng.uniform(size=(5, S)).astype(np.float32)

    cases = [
        ("rank_dot", k_rank, [needs, lt], (1, Lp)),
        ("soht_build", k_soht, [rank.reshape(1, Lp).astype(np.float32)],
         (S, Lp)),
        ("pack_dot_general", k_pack,
         [rng.uniform(size=(R, Lp)).astype(np.float32),
          soht], (R, S)),
        ("route_pick", k_pick, [route, ridx], (1, nWc * S)),
        ("hop_gather", k_gather, [rows5, wl], (5, nWc * S)),
        ("scatter", k_scatter, [vals, soht], (5, Lp)),
    ]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--case="):
            only = a.split("=", 1)[1]
    out = {"Lp": Lp, "nWc": nWc}
    for name, kern, args, oshape in cases:
        if only and name != only:
            continue
        try:
            fn = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32))
            r = np.asarray(jax.jit(fn)(*[jnp.asarray(a) for a in args]))
            out[name] = {"ok": True, "finite": bool(np.isfinite(r).all())}
        except Exception as e:  # noqa: BLE001
            out[name] = {"ok": False,
                         "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: out[name]}), flush=True)


if __name__ == "__main__":
    main()
