"""Gradient-parity sanity check: native AD vs analytic per-case Jacobians.

The runnable equivalent of the reference's de-facto unit tests
(``example/sanity/macro.py:68-129``, ``example/sanity/micro.py:100-173``),
which compare an analytic backward pass against autodiff over randomized
states and report the max/avg relative error on significant entries. Here
the production gradient is native JAX AD through the branch-free vectorized
kernels, and the analytic twin is the per-case Jacobian oracle
(:mod:`dhts.ops.darz` / :mod:`dhts.ops.didm`).

Run: ``python -m dhts.apps.sanity [--model macro|micro] [--n_trial 100]``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dhts.ops import arz, darz, didm, idm


def _report(name, ad, oracle, threshold=1e-5):
    ad = np.asarray(ad)
    oracle = np.asarray(oracle)
    mask = np.abs(oracle) > threshold
    if not mask.any():
        print(f"{name}: no significant entries")
        return 0.0
    rel = np.abs(ad - oracle)[mask] / np.abs(oracle)[mask]
    print(f"{name}: max rel err {rel.max() * 100:.5f}% | "
          f"avg rel err {rel.mean() * 100:.5f}% over {mask.sum()} entries")
    return float(rel.max())


def sanity_macro(n_trial, u_max=30.0, seed=0):
    rng = np.random.default_rng(seed)
    n = n_trial
    r_l = jnp.asarray(rng.uniform(0.01, 0.99, n), jnp.float32)
    u_l = jnp.asarray(rng.uniform(0.5, u_max * 0.95, n), jnp.float32)
    r_r = jnp.asarray(rng.uniform(0.01, 0.99, n), jnp.float32)
    u_r = jnp.asarray(rng.uniform(0.5, u_max * 0.95, n), jnp.float32)
    y_l = arz.compute_y(r_l, u_l, u_max)
    y_r = arz.compute_y(r_r, u_r, u_max)

    def q0(rl, yl, rr, yr):
        ul = arz.compute_u(rl, yl, u_max)
        ur = arz.compute_u(rr, yr, u_max)
        sol = arz.riemann_solve(rl, yl, ul, rr, ur, u_max)
        return jnp.stack([sol.r0, sol.y0])

    ad = jax.vmap(jax.jacfwd(q0, argnums=(0, 1, 2, 3)))(r_l, y_l, r_r, y_r)
    _, dL, dR = jax.vmap(
        lambda a, b, c, d: darz.interface_jacobians(a, b, c, d, u_max))(
            r_l, y_l, r_r, y_r)
    ad_dL = jnp.stack([jnp.stack([ad[0][:, 0], ad[1][:, 0]], -1),
                       jnp.stack([ad[0][:, 1], ad[1][:, 1]], -1)], 1)
    ad_dR = jnp.stack([jnp.stack([ad[2][:, 0], ad[3][:, 0]], -1),
                       jnp.stack([ad[2][:, 1], ad[3][:, 1]], -1)], 1)
    worst = max(_report("macro dQ0/dQL", ad_dL, dL),
                _report("macro dQ0/dQR", ad_dR, dR))
    return worst


def sanity_micro(n_trial, u_max=30.0, seed=0, dt=0.01):
    rng = np.random.default_rng(seed)
    n = n_trial
    ego = jnp.asarray(np.stack([rng.uniform(0, 100, n),
                                rng.uniform(0, 25, n)], -1), jnp.float32)
    lead = jnp.asarray(np.stack([ego[:, 0] + rng.uniform(5.5, 40, n),
                                 rng.uniform(0, 25, n)], -1), jnp.float32)
    params = dict(accel_max=u_max, accel_pref=0.8 * u_max,
                  target_speed=0.9 * u_max, min_space=0.5, time_pref=0.1,
                  length=5.0, lead_length=5.0)

    def nxt(e, l):
        gap = jnp.maximum(jnp.abs(l[0] - e[0]) - 5.0,
                          idm.POSITION_DELTA_EPS)
        res = idm.idm_acceleration(params["accel_max"], params["accel_pref"],
                                   e[1], params["target_speed"], gap,
                                   e[1] - l[1], params["min_space"],
                                   params["time_pref"], dt)
        return jnp.stack([e[0] + dt * e[1], e[1] + dt * res.acceleration])

    ad_de = jax.vmap(jax.jacfwd(nxt, argnums=0))(ego, lead)
    ad_dl = jax.vmap(jax.jacfwd(nxt, argnums=1))(ego, lead)
    _, o_de, o_dl = jax.vmap(
        lambda e, l: didm.step_jacobians(e, l, params, dt))(ego, lead)
    worst = max(_report("micro d(next)/d(ego)", ad_de, o_de),
                _report("micro d(next)/d(lead)", ad_dl, o_dl))
    return worst


def main(argv=None):
    ap = argparse.ArgumentParser("Gradient-parity sanity check")
    ap.add_argument("--model", choices=["macro", "micro", "both"],
                    default="both")
    ap.add_argument("--n_trial", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    worst = 0.0
    if args.model in ("macro", "both"):
        worst = max(worst, sanity_macro(args.n_trial, seed=args.seed))
    if args.model in ("micro", "both"):
        worst = max(worst, sanity_micro(args.n_trial, seed=args.seed))
    ok = worst < 1e-3
    print(f"sanity {'PASSED' if ok else 'FAILED'} "
          f"(worst rel err {worst * 100:.5f}%)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
