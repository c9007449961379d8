"""Fused Pallas macro rollout vs the jnp scan reference: values + gradients.

Runs in interpreter mode on CPU (the kernel itself targets TPU); numerics
must match the scan implementation to float32 tolerance, including the
custom-VJP backward against the scan's native AD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.models import lane
from dhts.ops import arz
from dhts.ops.pallas import make_fused_macro_rollout

U_MAX, DT, DX = 30.0, 0.01, 5.0


def _setup(B=3, C=10, seed=0):
    rng = np.random.default_rng(seed)
    r0 = jnp.asarray(rng.uniform(0.1, 0.9, (B, C)), jnp.float32)
    u0 = jnp.asarray(rng.uniform(2.0, 25.0, (B, C)), jnp.float32)
    y0 = arz.compute_y(r0, u0, U_MAX)
    bc = tuple(jnp.asarray(v, jnp.float32) for v in (
        rng.uniform(0.1, 0.9, B), rng.uniform(2.0, 25.0, B),
        rng.uniform(0.1, 0.9, B), rng.uniform(2.0, 25.0, B)))
    return r0, y0, bc


def _scan_rollout(r0, y0, bc, T):
    def one(r, y, blr, blu, brr, bru):
        res = lane.macro_rollout(r, arz.compute_u(r, y, U_MAX), blr, blu,
                                 brr, bru, U_MAX, DT, DX, T)
        return res.r, res.y

    return jax.vmap(one)(r0, y0, *bc)


def test_fused_forward_matches_scan():
    T = 60
    r0, y0, bc = _setup()
    fused = make_fused_macro_rollout(U_MAX, DT, DX, T, num_cell=10, batch=3,
                                     interpret=True)
    rT_f, yT_f, ms = fused(r0, y0, *bc)
    rT_s, yT_s = _scan_rollout(r0, y0, bc, T)
    np.testing.assert_allclose(np.asarray(rT_f), np.asarray(rT_s), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(yT_f), np.asarray(yT_s), rtol=2e-4,
                               atol=2e-3)
    assert np.all(np.asarray(ms) * DT < DX)


def test_fused_gradients_match_scan():
    T = 40
    r0, y0, bc = _setup(seed=1)
    fused = make_fused_macro_rollout(U_MAX, DT, DX, T, num_cell=10, batch=3,
                                     interpret=True)

    def loss_fused(r0, y0, blr, blu, brr, bru):
        rT, yT, _ = fused(r0, y0, blr, blu, brr, bru)
        return jnp.sum(rT ** 2) + 1e-3 * jnp.sum(yT ** 2)

    def loss_scan(r0, y0, blr, blu, brr, bru):
        rT, yT = _scan_rollout(r0, y0, (blr, blu, brr, bru), T)
        return jnp.sum(rT ** 2) + 1e-3 * jnp.sum(yT ** 2)

    args = (r0, y0) + bc
    g_f = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g_s = jax.grad(loss_scan, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_f, g_s):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)


def test_fused_vmem_budget_guard():
    with pytest.raises(AssertionError):
        make_fused_macro_rollout(U_MAX, DT, DX, num_steps=100000, num_cell=64,
                                 batch=256, interpret=True)


def test_fused_micro_matches_scan():
    from dhts.models import lane as dlane
    from dhts.models.network import (DEFAULT_HEAD_POSITION_DELTA,
                                     DEFAULT_HEAD_SPEED_DELTA)
    from dhts.models.vehicle import default_params
    from dhts.ops.pallas import make_fused_micro_rollout

    T, n, B, dt = 50, 6, 2, 0.01
    rng = np.random.default_rng(3)
    pos0 = jnp.asarray(np.sort(rng.uniform(0, 100, (B, n)), axis=1),
                       jnp.float32)
    vel0 = jnp.asarray(rng.uniform(2, 20, (B, n)), jnp.float32)
    params = default_params(30.0, (n,))
    fused = make_fused_micro_rollout(dt, T, n, B, params,
                                     DEFAULT_HEAD_POSITION_DELTA,
                                     DEFAULT_HEAD_SPEED_DELTA,
                                     interpret=True)

    def scan_one(p, v):
        res = dlane.micro_rollout(p, v, params, jnp.ones(n, bool),
                                  DEFAULT_HEAD_POSITION_DELTA,
                                  DEFAULT_HEAD_SPEED_DELTA, dt, T)
        return res.position, res.speed

    pT_s, vT_s = jax.vmap(scan_one)(pos0, vel0)
    pT_f, vT_f = fused(pos0, vel0)
    np.testing.assert_allclose(np.asarray(pT_f), np.asarray(pT_s), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(vT_f), np.asarray(vT_s), rtol=1e-4,
                               atol=1e-4)

    # gradients
    def loss_f(p, v):
        pT, vT = fused(p, v)
        return jnp.sum(pT ** 2) * 1e-4 + jnp.sum(vT ** 2) * 1e-2

    def loss_s(p, v):
        pT, vT = jax.vmap(scan_one)(p, v)
        return jnp.sum(pT ** 2) * 1e-4 + jnp.sum(vT ** 2) * 1e-2

    gf = jax.grad(loss_f, argnums=(0, 1))(pos0, vel0)
    gs = jax.grad(loss_s, argnums=(0, 1))(pos0, vel0)
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-5)


def test_segmented_rollout_matches_scan_long_horizon():
    from dhts.ops.pallas.macro_rollout import make_segmented_macro_rollout

    T = 130  # 2 full chunks of 50 + remainder 30
    r0, y0, bc = _setup(seed=7)
    seg = make_segmented_macro_rollout(U_MAX, DT, DX, T, num_cell=10, batch=3,
                                       chunk=50, interpret=True)
    rT_f, yT_f, ms = seg(r0, y0, *bc)
    rT_s, yT_s = _scan_rollout(r0, y0, bc, T)
    np.testing.assert_allclose(np.asarray(rT_f), np.asarray(rT_s), rtol=2e-5,
                               atol=2e-5)

    def loss_f(r, y):
        rT, yT, _ = seg(r, y, *bc)
        return jnp.sum(rT ** 2)

    def loss_s(r, y):
        rT, yT = _scan_rollout(r, y, bc, T)
        return jnp.sum(rT ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1))(r0, y0)
    gs = jax.grad(loss_s, argnums=(0, 1))(r0, y0)
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)
