"""Analytic per-case Jacobians of the ARZ Riemann interface state.

The reference's headline machinery is a hand-derived backward pass: 2x2
Jacobians of the Riemann solution w.r.t. the left/right cell states,
dispatched on the solved case index (``model/macro/darz.py:6-234``), wrapped
into a custom autograd op (``road/lane/dmacro_lane.py:13-309``). On TPU that
machinery is unnecessary — JAX reverse-mode AD differentiates the branch-free
solver in :mod:`dhts.ops.arz` directly — but the *per-case* derivative is
still valuable as an independent oracle: it differentiates the selected
analytic construction in isolation (Q_L / Q_M / Q_C as closed forms), with no
``where`` cascade in the graph, so any branch-selection bug in the vectorized
solver's VJP shows up as a mismatch.

Here the per-case Jacobians are obtained by forward-mode AD (``jacfwd``) of
the case constructors, which is exactly "the analytic derivative of the
selected case" without hand-transcribing 200 lines of chain rule. Exposed:

* :func:`interface_jacobians` — d(Q_0)/d(Q_L), d(Q_0)/d(Q_R) as 2x2 blocks
  in (r, y) coordinates, dispatched on ``case_ind`` like the reference's
  ``dARZ.compute_dLdR`` (``darz.py:194-215``).
* :func:`flux_jacobian` — d(flux)/d(Q) of a full state, the reference's
  ``dARZ.flux_prime`` (``darz.py:217-234``).

These also power the optional custom-VJP macro fast path (see
``dhts.ops.pallas``) and the gradient-parity tests in
``tests/test_grad_parity.py`` (the TPU analogue of the reference's
``example/sanity/macro.py`` methodology).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dhts.ops import arz


def _q0_case0(q_l, q_r, u_max):
    """Case 0: interface state is Q_L itself (reference darz.py:12-33)."""
    del q_r, u_max
    return q_l


def _q0_case1(q_l, q_r, u_max):
    """Case 1: middle state Q_M (reference darz.py:35-122)."""
    r_l, y_l = q_l
    r_r, y_r = q_r
    u_l = arz.compute_u(r_l, y_l, u_max)
    u_r = arz.compute_u(r_r, y_r, u_max)
    r_m = arz._pow_inv_gamma(arz._pow_gamma(r_l) + (u_l - u_r) / u_max)
    y_m = arz.compute_y(r_m, u_r, u_max)
    return jnp.stack([r_m, y_m])


def _q0_case2(q_l, q_r, u_max):
    """Case 2: centered rarefaction Q_C (reference darz.py:124-192)."""
    r_l, y_l = q_l
    del q_r
    u_l = arz.compute_u(r_l, y_l, u_max)
    g = arz.GAMMA
    r_c = arz._pow_inv_gamma(
        (u_l + u_max * arz._pow_gamma(r_l)) / ((g + 1.0) * u_max))
    u_c = (g / (g + 1.0)) * (u_l + u_max * arz._pow_gamma(r_l))
    return jnp.stack([r_c, arz.compute_y(r_c, u_c, u_max)])


def interface_jacobians(r_l, y_l, r_r, y_r, u_max):
    """Per-case analytic Jacobians of Q_0 w.r.t. Q_L and Q_R.

    Returns ``(q0, dL, dR)`` where ``q0`` is the 2-vector interface state and
    ``dL, dR`` are 2x2 Jacobians in (r, y) coordinates, dispatched on the
    solved case exactly like the reference's ``dARZ.compute_dLdR``
    (``model/macro/darz.py:194-215``). Scalar inputs; vmap for batches.
    """
    u_l = arz.compute_u(r_l, y_l, u_max)
    u_r = arz.compute_u(r_r, y_r, u_max)
    sol = arz.riemann_solve(r_l, y_l, u_l, r_r, u_r, u_max)

    q_l = jnp.stack([r_l, y_l])
    q_r = jnp.stack([r_r, y_r])

    branches = [_q0_case0, _q0_case1, _q0_case2]

    def value(c):
        return jax.lax.switch(c, branches, q_l, q_r, u_max)

    q0 = value(sol.case_ind)
    dL = jax.jacfwd(lambda q: jax.lax.switch(sol.case_ind, branches, q, q_r,
                                             u_max))(q_l)
    dR = jax.jacfwd(lambda q: jax.lax.switch(sol.case_ind, branches, q_l, q,
                                             u_max))(q_r)
    return q0, dL, dR


def flux_jacobian(r, y, u_max):
    """d(flux)/d(q): Jacobian of ``(r*u, y*u)`` w.r.t. ``(r, y)``.

    Reference ``dARZ.flux_prime`` (``model/macro/darz.py:217-234``).
    """

    def flux(q):
        rr, yy = q
        u = arz.compute_u(rr, yy, u_max)
        return jnp.stack([rr * u, yy * u])

    return jax.jacfwd(flux)(jnp.stack([r, y]))
