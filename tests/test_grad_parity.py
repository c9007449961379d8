"""Gradient parity: native JAX AD vs analytic per-case Jacobian oracles.

TPU analogue of the reference's de-facto unit tests
(``example/sanity/macro.py``, ``example/sanity/micro.py``), which compare a
hand-derived analytic backward pass against autodiff over randomized states.
Here the roles are swapped: native AD through the *branch-free vectorized*
kernels is the production path, and the per-case analytic Jacobians
(:mod:`dhts.ops.darz`, :mod:`dhts.ops.didm`) are the oracle. A mismatch means
the ``where``-cascade's VJP disagrees with the derivative of the analytically
selected case — i.e. a branch-selection bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.ops import arz, darz, didm, idm


def _random_full_states(n, seed, u_max=30.0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.01, 0.99, n).astype(np.float32)
    u = rng.uniform(0.5, u_max * 0.95, n).astype(np.float32)
    y = np.asarray(arz.compute_y(r, u, u_max))
    return jnp.asarray(r), jnp.asarray(y)


def test_macro_interface_jacobians_match_autodiff():
    """d(Q_0)/d(Q_L,Q_R): vectorized-solver AD vs per-case analytic oracle."""
    u_max = 30.0
    n = 64
    r_l, y_l = _random_full_states(n, 0, u_max)
    r_r, y_r = _random_full_states(n, 1, u_max)

    def q0_from_solver(rl, yl, rr, yr):
        ul = arz.compute_u(rl, yl, u_max)
        ur = arz.compute_u(rr, yr, u_max)
        sol = arz.riemann_solve(rl, yl, ul, rr, ur, u_max)
        return jnp.stack([sol.r0, sol.y0])

    ad_jac = jax.vmap(jax.jacfwd(q0_from_solver, argnums=(0, 1, 2, 3)))(
        r_l, y_l, r_r, y_r)
    oracle = jax.vmap(
        lambda a, b, c, d: darz.interface_jacobians(a, b, c, d, u_max))(
            r_l, y_l, r_r, y_r)
    _, dL, dR = oracle

    ad_dL = jnp.stack([jnp.stack([ad_jac[0][:, 0], ad_jac[1][:, 0]], -1),
                       jnp.stack([ad_jac[0][:, 1], ad_jac[1][:, 1]], -1)], 1)
    ad_dR = jnp.stack([jnp.stack([ad_jac[2][:, 0], ad_jac[3][:, 0]], -1),
                       jnp.stack([ad_jac[2][:, 1], ad_jac[3][:, 1]], -1)], 1)

    # relative error on significant entries, as in the reference's sanity
    # scripts (threshold 1e-5, report max relative error)
    for ad, orc in [(ad_dL, dL), (ad_dR, dR)]:
        ad = np.asarray(ad)
        orc = np.asarray(orc)
        mask = np.abs(orc) > 1e-5
        rel = np.abs(ad - orc)[mask] / np.abs(orc)[mask]
        assert rel.max() < 1e-3, rel.max()
        # entries the analytic Jacobian says are ~zero must also be ~zero
        # under AD — a dead-branch cotangent leak would land exactly here
        if (~mask).any():
            assert np.abs(ad[~mask]).max() < 1e-3, np.abs(ad[~mask]).max()


def test_micro_step_jacobians_match_autodiff():
    u_max = 30.0
    dt = 0.01
    rng = np.random.default_rng(2)
    n = 64
    ego = jnp.asarray(
        np.stack([rng.uniform(0, 100, n),
                  rng.uniform(0, 25, n)], -1), jnp.float32)
    lead = jnp.asarray(
        np.stack([ego[:, 0] + rng.uniform(6, 40, n),
                  rng.uniform(0, 25, n)], -1), jnp.float32)
    params = dict(accel_max=u_max, accel_pref=0.8 * u_max,
                  target_speed=0.9 * u_max, min_space=0.5, time_pref=0.1,
                  length=5.0, lead_length=5.0)

    def next_state(e, l):
        gap = jnp.abs(l[0] - e[0]) - 5.0
        gap = jnp.maximum(gap, idm.POSITION_DELTA_EPS)
        res = idm.idm_acceleration(params["accel_max"], params["accel_pref"],
                                   e[1], params["target_speed"], gap,
                                   e[1] - l[1], params["min_space"],
                                   params["time_pref"], dt)
        return jnp.stack([e[0] + dt * e[1], e[1] + dt * res.acceleration])

    ad_de = jax.vmap(jax.jacfwd(next_state, argnums=0))(ego, lead)
    ad_dl = jax.vmap(jax.jacfwd(next_state, argnums=1))(ego, lead)
    nxt, orc_de, orc_dl = jax.vmap(
        lambda e, l: didm.step_jacobians(e, l, params, dt))(ego, lead)

    np.testing.assert_allclose(np.asarray(ad_de), np.asarray(orc_de),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ad_dl), np.asarray(orc_dl),
                               rtol=1e-4, atol=1e-5)


def test_flux_jacobian_consistency():
    u_max = 30.0
    r, y = 0.4, -1.3

    def flux(q):
        u = arz.compute_u(q[0], q[1], u_max)
        return jnp.stack([q[0] * u, q[1] * u])

    ad = jax.jacfwd(flux)(jnp.asarray([r, y], jnp.float32))
    orc = darz.flux_jacobian(jnp.float32(r), jnp.float32(y), u_max)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(orc), rtol=1e-5)


def test_head_vehicle_jacobian():
    dt = 0.01
    params = dict(accel_max=30.0, accel_pref=24.0, target_speed=27.0,
                  min_space=0.5, time_pref=0.1, length=5.0, lead_length=5.0)
    ego = jnp.asarray([10.0, 15.0], jnp.float32)
    nxt, d_ego = didm.head_step_jacobian(ego, (1000.0, 0.0), params, dt)

    def f(e):
        res = idm.idm_acceleration(30.0, 24.0, e[1], 27.0, 1000.0, 0.0, 0.5,
                                   0.1, dt)
        return jnp.stack([e[0] + dt * e[1], e[1] + dt * res.acceleration])

    ad = jax.jacfwd(f)(ego)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(d_ego), rtol=1e-5,
                               atol=1e-6)
