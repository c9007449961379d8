"""Probe: isolated device cost of the ARZ Riemann solve at scale.

The 7x7 family ablation (result/merge/ablate7.json) shows -riemann
dropping the fwd-only slope 68.18 -> 18.94 us/step, i.e. ~72% of the
forward. But the stub changes the DYNAMICS (linear upwind flux), so the
delta may be knock-on (different vehicle counts / walk trip counts),
not the solve's own cost. This probe times riemann_solve (and the
linear-flux stub, and the godunov update around it) in isolation on the
exact shapes the fused kernel uses ([C+1, Lp], C=4), slope method
(two in-kernel iteration counts), host-fetch completion, distinct
buffers per rep — per the round-4 device-measurement lessons.

Usage (TPU): python bench/probe_riemann.py
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
    # both slope points stay under the ~10k fori_loop trip count that
    # intermittently wedges the remote compile (device lessons): 1500
    # and 1500*6=9000
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--lps", type=int, nargs="*", default=[256, 1024, 1408])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from dhts.ops import arz

    C = 4
    u_max = 60.0

    def mk(case, Lp, iters):
        def kern(r_ref, y_ref, out_ref):
            r = r_ref[...]
            y = y_ref[...]

            def body(_, carry):
                r, y = carry
                u = arz.compute_u(r, y, u_max)
                # ghost rows like the kernel: roll the state one row
                bl_r, bl_y, bl_u = r[0:1], y[0:1], u[0:1]
                br_r, br_u = r[C - 1:C], u[C - 1:C]
                rl = jnp.concatenate([bl_r, r], axis=0)
                yl = jnp.concatenate([bl_y, y], axis=0)
                ul = jnp.concatenate([bl_u, u], axis=0)
                rr_ = jnp.concatenate([r, br_r], axis=0)
                ur_ = jnp.concatenate([u, br_u], axis=0)
                if case == "riemann":
                    sol = arz.riemann_solve(rl, yl, ul, rr_, ur_, u_max)
                    fr = sol.r0 * sol.u0
                    fy = sol.y0 * sol.u0
                elif case == "linear_flux":
                    fr = rl * ul
                    fy = yl * ul
                elif case == "uy_only":
                    fr = rl * ul
                    fy = yl * ul
                coef = 1e-6
                nr = jnp.clip(r + (fr[:-1] - fr[1:]) * coef, 1e-4, 1.0)
                ny = y + (fy[:-1] - fy[1:]) * coef
                return nr, ny

            if case == "uy_only":
                # just the u<->y conversions + ghost concats, no flux use
                def body(_, carry):  # noqa: F811
                    r, y = carry
                    u = arz.compute_u(r, y, u_max)
                    y2 = arz.compute_y(r, u, u_max)
                    return r * 0.999755859375 + 1e-8, y2
            rf, yf = jax.lax.fori_loop(0, iters, body, (r, y))
            out_ref[...] = rf + yf
        return kern

    rng = np.random.default_rng(0)
    for Lp in args.lps:
        for case in ("linear_flux", "riemann", "uy_only"):
            try:
                shape = (C, Lp)
                xs = []
                for _ in range(args.reps):
                    r = rng.uniform(0.05, 0.8, shape).astype(np.float32)
                    u = rng.uniform(1.0, 50.0, shape).astype(np.float32)
                    xs.append((jnp.asarray(r), jnp.asarray(
                        np.asarray(r * (u - u_max * (1 - np.sqrt(r))),
                                   dtype=np.float32))))
                ts = {}
                for iters in (args.iters, args.iters * 6):
                    fn = pl.pallas_call(
                        mk(case, Lp, iters),
                        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
                    jfn = jax.jit(fn)
                    np.asarray(jfn(*xs[-1]))
                    times = []
                    for x in xs:
                        t0 = time.perf_counter()
                        np.asarray(jfn(*x))
                        times.append(time.perf_counter() - t0)
                    ts[iters] = min(times)
                per_it = ((ts[args.iters * 6] - ts[args.iters]) /
                          (args.iters * 5) * 1e9)
                print(json.dumps({"case": case, "lp": Lp,
                                  "nsec_per_iter": round(per_it, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"case": case, "lp": Lp,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
