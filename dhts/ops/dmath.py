"""Differentiable soft-logic primitives.

The reference implements exactly one such op — a scaled, clamped sigmoid used
as a soft IF statement (``dmath/operation.py:3-30`` in the reference) — plus a
family of ad-hoc "detach tricks" scattered through its conversion code
(``road/network/conversion.py:62-68,141-155``). Here they are collected as a
small library of named straight-through-gradient combinators so the event
logic in :mod:`dhts.models.conversion` reads declaratively.

All functions broadcast elementwise over arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_sigmoid(value, constant, lo=-16.0, hi=16.0):
    """Saturating sigmoid usable as a differentiable IF statement.

    Computes ``sigmoid(clip(value * constant, lo, hi))``. ``constant`` scales
    ``value`` into the sigmoid's active range; the clip prevents vanishing /
    exploding gradients far from the decision boundary.

    Parity: reference ``dmath/operation.py:3-30``.
    """
    return jax.nn.sigmoid(jnp.clip(value * constant, lo, hi))


def hard_indicator(value):
    """Non-differentiable IF: 1.0 where ``value > 0`` else 0.0 (float)."""
    return (value > 0.0).astype(jnp.result_type(value, jnp.float32))


def indicator(value, constant, differentiable: bool):
    """Soft or hard indicator of ``value > 0`` depending on mode.

    This is the single switch the reference threads through its code as the
    ``differentiable: bool`` flag: soft sigmoid when optimizing by gradient,
    exact comparison when evaluating. ``differentiable`` must be a static
    Python bool (it selects which graph gets traced).
    """
    if differentiable:
        return soft_sigmoid(value, constant)
    return hard_indicator(value)


def straight_through(hard, soft):
    """Forward value ``hard``, backward gradient of ``soft``.

    ``hard`` and ``soft`` must broadcast to a common shape.
    """
    return soft + jax.lax.stop_gradient(hard - soft)


def grad_carrier(value, grad_src):
    """A constant ``value`` that carries ``grad_src``'s gradient.

    Equivalent to ``value + grad_src - stop_gradient(grad_src)``: evaluates to
    ``value`` but backpropagates into ``grad_src``. This reproduces the
    reference's ancillary ``a`` variable trick at vehicle emission, where the
    emitted vehicle's mass equals its length but its gradient flows back into
    the macro lane's flux capacitor (reference ``road/network/conversion.py:62``:
    ``nv.a = tflux - (flux - nv.length)`` with ``flux = detach(tflux)``).
    """
    return value + grad_src - jax.lax.stop_gradient(grad_src)


def st_clip(x, lo, hi):
    """Straight-through clamp: forward ``clip(x, lo, hi)``, backward identity.

    Reproduces the reference's "differentiable clamp" at vehicle absorption
    (``road/network/conversion.py:141-155``), which shifts the value by a
    *detached* correction so the clamp does not zero the gradient.
    """
    return x - jax.lax.stop_gradient(x - jnp.clip(x, lo, hi))


def detached(x):
    """Alias for ``lax.stop_gradient`` to keep event code self-describing."""
    return jax.lax.stop_gradient(x)
