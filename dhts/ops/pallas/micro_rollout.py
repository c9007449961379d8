"""Time-fused IDM micro-lane rollout as a single Pallas TPU kernel.

Counterpart of :mod:`dhts.ops.pallas.macro_rollout` for the microscopic
model: all ``T`` explicit-Euler IDM steps of a platoon (V vehicles x B
batched scenarios) run inside one Pallas program with the state in VMEM,
custom VJP via reverse replay of the on-chip trajectory. Covers the
reference's per-vehicle hot loop (``road/lane/_micro_lane.py:131-186``) and
its hand-written backward (``dmicro_lane.py``) for the single-lane setting
(fixed virtual-leader deltas — the inverse-micro benchmark).

Layout: vehicles on the sublane axis (slot i behind slot i+1, padded to a
multiple of 8; padding rows frozen), batch on the lane axis (padded to 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dhts.ops import idm

_LANE = 128
_SUBLANE = 8
_VMEM_RESIDUAL_BUDGET = 10 * 1024 * 1024


def _round_up(x, m):
    return (x + m - 1) // m * m


def _mstep(pos, vel, p, head_pd, head_sd, dt, num_vehicle):
    """One IDM+Euler step on [V, B] state; ``p`` holds [V, 1] params."""
    V = pos.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0)
    active = rows < num_vehicle
    is_head = rows == num_vehicle - 1

    lead_pos = jnp.concatenate([pos[1:], jnp.zeros_like(pos[:1])], axis=0)
    lead_vel = jnp.concatenate([vel[1:], jnp.zeros_like(vel[:1])], axis=0)
    lead_len = jnp.concatenate([p["length"][1:], p["length"][:1]], axis=0)

    gap = jnp.abs(lead_pos - pos) - (lead_len + p["length"]) * 0.5
    dv = vel - lead_vel
    gap = jnp.where(is_head, head_pd, gap)
    dv = jnp.where(is_head, head_sd, dv)
    collided = gap < 0.0
    gap = jnp.maximum(jnp.where(collided, 0.0, gap),
                      idm.POSITION_DELTA_EPS)
    dv = jnp.where(collided, 0.0, dv)

    res = idm.idm_acceleration(p["accel_max"], p["accel_pref"], vel,
                               p["target_speed"], gap, dv, p["min_space"],
                               p["time_pref"], dt)
    acc = jnp.where(active, res.acceleration, 0.0)
    new_pos = jnp.where(active, pos + dt * vel, pos)
    new_vel = jnp.where(active, vel + dt * acc, vel)
    return new_pos, new_vel


def make_fused_micro_rollout(delta_time: float, num_steps: int,
                             num_vehicle: int, batch: int, params,
                             head_position_delta: float,
                             head_speed_delta: float, *,
                             interpret: bool | None = None):
    """Build ``fn(pos0, vel0) -> (posT, velT)`` over ``[B, V]`` arrays.

    ``params``: a :class:`dhts.models.vehicle.VehicleParams` of per-vehicle
    vectors ``[V]`` (shared across the batch, like the reference's default
    vehicles). Differentiable w.r.t. ``pos0``/``vel0``.
    """
    V = _round_up(max(num_vehicle, 1), _SUBLANE)
    B = _round_up(max(batch, 1), _LANE)
    T = int(num_steps)
    residual_bytes = 2 * T * V * B * 4
    assert residual_bytes <= _VMEM_RESIDUAL_BUDGET, (
        f"rollout residuals ({residual_bytes/2**20:.1f} MiB) exceed VMEM "
        f"budget; segment the rollout")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def pad_param(x):
        # stays host-side numpy: the factory may be built INSIDE a jit trace
        # (lazily on first use), where any jnp op would return a tracer that
        # must not be cached across traces. Numpy constants convert per call.
        import numpy as np

        x = np.asarray(x, np.float32).reshape(num_vehicle, 1)
        # pad with safe defaults (positive speeds/accels avoid div-by-zero
        # garbage in frozen rows)
        fill = np.broadcast_to(np.maximum(x[-1:], 1e-2),
                               (V - num_vehicle, 1))
        return np.ascontiguousarray(
            np.concatenate([x, fill], axis=0), np.float32)

    pdict = {k: pad_param(getattr(params, k)) for k in
             ("accel_max", "accel_pref", "target_speed", "min_space",
              "time_pref", "length")}
    pkeys = sorted(pdict.keys())

    step = functools.partial(_mstep, head_pd=head_position_delta,
                             head_sd=head_speed_delta, dt=delta_time,
                             num_vehicle=num_vehicle)

    def fwd_kernel(pos_ref, vel_ref, *rest):
        prefs = dict(zip(pkeys, rest[: len(pkeys)]))
        posT_ref, velT_ref, traj_p_ref, traj_v_ref = rest[len(pkeys):]
        p = {k: prefs[k][:] for k in pkeys}

        def body(t, carry):
            pos, vel = carry
            traj_p_ref[t] = pos
            traj_v_ref[t] = vel
            return step(pos, vel, p)

        pos, vel = jax.lax.fori_loop(0, T, body, (pos_ref[:], vel_ref[:]))
        posT_ref[:] = pos
        velT_ref[:] = vel

    def run_forward(pos0, vel0):
        return pl.pallas_call(
            fwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((V, B), jnp.float32),
                jax.ShapeDtypeStruct((V, B), jnp.float32),
                jax.ShapeDtypeStruct((T, V, B), jnp.float32),
                jax.ShapeDtypeStruct((T, V, B), jnp.float32),
            ),
            interpret=interpret,
        )(pos0, vel0, *(pdict[k] for k in pkeys))

    def bwd_kernel(traj_p_ref, traj_v_ref, *rest):
        prefs = dict(zip(pkeys, rest[: len(pkeys)]))
        g_pT_ref, g_vT_ref, g_p0_ref, g_v0_ref = rest[len(pkeys):]
        p = {k: prefs[k][:] for k in pkeys}

        def body(i, carry):
            gp, gv = carry
            t = T - 1 - i
            pos = traj_p_ref[t]
            vel = traj_v_ref[t]
            _, vjp = jax.vjp(lambda a, b: step(a, b, p), pos, vel)
            return vjp((gp, gv))

        gp, gv = jax.lax.fori_loop(0, T, body, (g_pT_ref[:], g_vT_ref[:]))
        g_p0_ref[:] = gp
        g_v0_ref[:] = gv

    def run_backward(traj_p, traj_v, g_pT, g_vT):
        return pl.pallas_call(
            bwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((V, B), jnp.float32),
                jax.ShapeDtypeStruct((V, B), jnp.float32),
            ),
            interpret=interpret,
        )(traj_p, traj_v, *(pdict[k] for k in pkeys), g_pT, g_vT)

    @jax.custom_vjp
    def rollout_padded(pos0, vel0):
        posT, velT, _, _ = run_forward(pos0, vel0)
        return posT, velT

    def fwd(pos0, vel0):
        posT, velT, tp, tv = run_forward(pos0, vel0)
        return (posT, velT), (tp, tv)

    def bwd(res, cots):
        tp, tv = res
        return run_backward(tp, tv, *cots)

    rollout_padded.defvjp(fwd, bwd)

    def fn(pos0, vel0):
        pos0 = jnp.asarray(pos0, jnp.float32).reshape(batch, num_vehicle)
        vel0 = jnp.asarray(vel0, jnp.float32).reshape(batch, num_vehicle)
        pad = lambda x: jnp.pad(x.T, ((0, V - num_vehicle), (0, B - batch)))
        posT, velT = rollout_padded(pad(pos0), pad(vel0))
        return posT[:num_vehicle, :batch].T, velT[:num_vehicle, :batch].T

    return fn
