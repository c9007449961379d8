"""Analytic per-branch Jacobians of the IDM Euler step — gradient oracle.

The reference hand-derives 2x2 Jacobians of a vehicle's next (position,
speed) w.r.t. its own and its leader's (position, speed), zeroing entries
when the forward-pass clamps fired (``model/micro/didm.py:12-103``), and
wraps them in a custom autograd op (``road/lane/dmicro_lane.py:15-298``). As
with dARZ, native JAX AD through ``jnp.maximum`` reproduces those branch-aware
semantics automatically; this module keeps the analytic twin as an
independent test oracle by differentiating the *clamp-resolved* closed form
with forward-mode AD.

Convention matches the reference: ego state ``(p, v)``, leader state
``(p_l, v_l)``, gap ``|p_l - p| - (len_l + len)/2``, speed delta ``v - v_l``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dhts.ops import idm


def _next_state(ego, lead, params, head_deltas, has_leader, dt):
    """Next (position, speed) of the ego vehicle after one Euler step."""
    p, v = ego
    if has_leader:
        p_l, v_l = lead
        gap = jnp.abs(p_l - p) - (params["lead_length"] +
                                  params["length"]) * 0.5
        dv = v - v_l
    else:
        gap, dv = head_deltas
    gap = jnp.maximum(gap, idm.POSITION_DELTA_EPS)
    res = idm.idm_acceleration(params["accel_max"], params["accel_pref"], v,
                               params["target_speed"], gap, dv,
                               params["min_space"], params["time_pref"], dt)
    return jnp.stack([p + dt * v, v + dt * res.acceleration])


def step_jacobians(ego, lead, params, dt):
    """``(next_state, d/d(ego), d/d(leader))`` for a followed vehicle.

    The 2x2 blocks correspond to the reference's ``dIDM.compute_dEgo`` /
    ``compute_dLeading`` (``model/micro/didm.py:12-103``).
    """
    ego = jnp.asarray(ego)
    lead = jnp.asarray(lead)
    nxt = _next_state(ego, lead, params, None, True, dt)
    d_ego = jax.jacfwd(lambda e: _next_state(e, lead, params, None, True, dt))(
        ego)
    d_lead = jax.jacfwd(lambda l: _next_state(ego, l, params, None, True, dt))(
        lead)
    return nxt, d_ego, d_lead


def head_step_jacobian(ego, head_deltas, params, dt):
    """``(next_state, d/d(ego))`` for the head vehicle (boundary deltas)."""
    ego = jnp.asarray(ego)
    nxt = _next_state(ego, None, params, head_deltas, False, dt)
    d_ego = jax.jacfwd(
        lambda e: _next_state(e, None, params, head_deltas, False, dt))(ego)
    return nxt, d_ego
