"""Time-fused ARZ macro-lane rollout as a single Pallas TPU kernel.

The reference's hot loop — ``num_cell + 1`` Riemann solves per lane per step
(``road/lane/_macro_lane.py:83-146``) repeated for hundreds of steps — maps
poorly to a launch-per-step execution: the state is a few KB, so per-step
overhead dominates. This kernel keeps the whole ``(C, B)`` cell state (C
cells x B batched scenarios) in VMEM and runs all ``T`` steps in one Pallas
program, writing the per-step trajectory to a VMEM-resident residual buffer.

Gradients come from a custom VJP whose backward pass is a second Pallas
kernel: it replays the stored per-step states in reverse, applying each
step's transposed Jacobian with an in-kernel ``jax.vjp`` of the step
function — i.e. the analytic per-step backward the reference hand-writes in
``road/lane/dmacro_lane.py`` is generated automatically, but scheduled like
the hand-written one (no XLA-level unrolled graph, state never leaves the
chip).

Layout: cells on the sublane axis (padded to a multiple of 8), batch on the
lane axis (padded to 128). Padding cells are initialized to the right-ghost
state so they form a zero-flux-difference plateau (same trick as
``dhts.models.network.lanes_forward``); boundary values must be constant
over the rollout (true for the inverse benchmarks).

VMEM budget: the trajectory buffers are ``2 * T * C * B * 4`` bytes; the
factory asserts they fit and callers with longer horizons should segment the
rollout (scan of fused chunks under ``jax.checkpoint``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dhts.ops import arz

_LANE = 128
_SUBLANE = 8
_VMEM_RESIDUAL_BUDGET = 10 * 1024 * 1024  # bytes for the two traj buffers


def _round_up(x, m):
    return (x + m - 1) // m * m


def _step(r, y, bl_r, bl_u, br_r, br_u, u_max, coef, num_cell):
    """One Godunov step on [C, B] state with [1, B] ghost rows.

    Rows >= ``num_cell`` are padding; they are (re)pinned to the right-ghost
    state every step so they stay a zero-flux-difference plateau (same trick
    as ``dhts.models.network.lanes_forward``)."""
    cell_mask = (jax.lax.broadcasted_iota(jnp.int32, (r.shape[0], 1), 0) <
                 num_cell)
    br_y = arz.compute_y(br_r, br_u, u_max)
    r = jnp.where(cell_mask, r, br_r)
    y = jnp.where(cell_mask, y, br_y)
    u = arz.compute_u(r, y, u_max)
    bl_y = arz.compute_y(bl_r, bl_u, u_max)
    rl = jnp.concatenate([bl_r, r], axis=0)
    yl = jnp.concatenate([bl_y, y], axis=0)
    ul = jnp.concatenate([bl_u, u], axis=0)
    rr = jnp.concatenate([r, br_r], axis=0)
    ur = jnp.concatenate([u, br_u], axis=0)
    sol = arz.riemann_solve(rl, yl, ul, rr, ur, u_max)
    fr = sol.r0 * sol.u0
    fy = sol.y0 * sol.u0
    new_r = r + (fr[:-1] - fr[1:]) * coef
    new_y = y + (fy[:-1] - fy[1:]) * coef
    max_speed = jnp.max(jnp.maximum(jnp.abs(sol.speed0), jnp.abs(sol.speed1)),
                        axis=0, keepdims=True)
    return new_r, new_y, max_speed


def make_fused_macro_rollout(u_max: float, delta_time: float,
                             cell_length: float, num_steps: int,
                             num_cell: int, batch: int, *,
                             interpret: bool | None = None):
    """Build ``fn(r0, y0, bl_r, bl_u, br_r, br_u) -> (rT, yT, max_wave)``.

    ``r0, y0``: ``[B, C]`` per-scenario cell states; boundary args ``[B]``.
    Returns final ``[B, C]`` states and the per-scenario max wave speed
    (CFL diagnostic, ``[B]``). Differentiable w.r.t. all six inputs.
    """
    C = _round_up(max(num_cell, 1), _SUBLANE)
    B = _round_up(max(batch, 1), _LANE)
    T = int(num_steps)
    residual_bytes = 2 * T * C * B * 4
    assert residual_bytes <= _VMEM_RESIDUAL_BUDGET, (
        f"rollout residuals ({residual_bytes/2**20:.1f} MiB) exceed VMEM "
        f"budget; segment the rollout into fused chunks")
    coef = delta_time / cell_length
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    step = functools.partial(_step, u_max=u_max, coef=coef,
                             num_cell=num_cell)

    # ---------------- forward kernel ------------------------------------
    def fwd_kernel(r_ref, y_ref, blr_ref, blu_ref, brr_ref, bru_ref,
                   rT_ref, yT_ref, ms_ref, traj_r_ref, traj_y_ref):
        blr, blu = blr_ref[:], blu_ref[:]
        brr, bru = brr_ref[:], bru_ref[:]

        def body(t, carry):
            r, y, ms = carry
            traj_r_ref[t] = r
            traj_y_ref[t] = y
            r, y, step_ms = step(r, y, blr, blu, brr, bru)
            return (r, y, jnp.maximum(ms, step_ms))

        r, y, ms = jax.lax.fori_loop(
            0, T, body, (r_ref[:], y_ref[:], jnp.zeros((1, B), jnp.float32)))
        rT_ref[:] = r
        yT_ref[:] = y
        ms_ref[:] = ms

    def run_forward(r0, y0, blr, blu, brr, bru):
        out = pl.pallas_call(
            fwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((C, B), jnp.float32),  # rT
                jax.ShapeDtypeStruct((C, B), jnp.float32),  # yT
                jax.ShapeDtypeStruct((1, B), jnp.float32),  # max speed
                jax.ShapeDtypeStruct((T, C, B), jnp.float32),  # traj r
                jax.ShapeDtypeStruct((T, C, B), jnp.float32),  # traj y
            ),
            interpret=interpret,
        )(r0, y0, blr, blu, brr, bru)
        return out

    # ---------------- backward kernel ------------------------------------
    def bwd_kernel(traj_r_ref, traj_y_ref, blr_ref, blu_ref, brr_ref,
                   bru_ref, g_rT_ref, g_yT_ref, g_r0_ref, g_y0_ref,
                   g_blr_ref, g_blu_ref, g_brr_ref, g_bru_ref):
        blr, blu = blr_ref[:], blu_ref[:]
        brr, bru = brr_ref[:], bru_ref[:]
        zero_b = jnp.zeros((1, B), jnp.float32)

        def body(i, carry):
            gr, gy, gblr, gblu, gbrr, gbru = carry
            t = T - 1 - i
            r = traj_r_ref[t]
            y = traj_y_ref[t]
            _, vjp = jax.vjp(
                lambda r_, y_, a, b, c, d: step(r_, y_, a, b, c, d)[:2],
                r, y, blr, blu, brr, bru)
            dr, dy, da, db, dc, dd = vjp((gr, gy))
            return (dr, dy, gblr + da, gblu + db, gbrr + dc, gbru + dd)

        init = (g_rT_ref[:], g_yT_ref[:], zero_b, zero_b, zero_b, zero_b)
        gr, gy, gblr, gblu, gbrr, gbru = jax.lax.fori_loop(0, T, body, init)
        g_r0_ref[:] = gr
        g_y0_ref[:] = gy
        g_blr_ref[:] = gblr
        g_blu_ref[:] = gblu
        g_brr_ref[:] = gbrr
        g_bru_ref[:] = gbru

    def run_backward(traj_r, traj_y, blr, blu, brr, bru, g_rT, g_yT):
        return pl.pallas_call(
            bwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((C, B), jnp.float32),
                jax.ShapeDtypeStruct((C, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ),
            interpret=interpret,
        )(traj_r, traj_y, blr, blu, brr, bru, g_rT, g_yT)

    # ---------------- custom-VJP wrapper over padded [C, B] arrays --------
    @jax.custom_vjp
    def rollout_padded(r0, y0, blr, blu, brr, bru):
        rT, yT, ms, _, _ = run_forward(r0, y0, blr, blu, brr, bru)
        return rT, yT, ms

    def rollout_fwd(r0, y0, blr, blu, brr, bru):
        rT, yT, ms, traj_r, traj_y = run_forward(r0, y0, blr, blu, brr, bru)
        return (rT, yT, ms), (traj_r, traj_y, blr, blu, brr, bru)

    def rollout_bwd(res, cots):
        traj_r, traj_y, blr, blu, brr, bru = res
        g_rT, g_yT, _ = cots  # max-speed diagnostic is non-differentiable
        g = run_backward(traj_r, traj_y, blr, blu, brr, bru, g_rT, g_yT)
        return g

    rollout_padded.defvjp(rollout_fwd, rollout_bwd)

    # ---------------- public [B, C] API with padding -----------------------
    fn = _make_public_fn(rollout_padded, u_max, num_cell, batch, C, B)
    return fn


def _make_public_fn(rollout_padded, u_max, num_cell, batch, C, B):
    def fn(r0, y0, bl_r, bl_u, br_r, br_u):
        r0 = jnp.asarray(r0, jnp.float32).reshape(batch, num_cell)
        y0 = jnp.asarray(y0, jnp.float32).reshape(batch, num_cell)
        row = lambda v: jnp.broadcast_to(
            jnp.asarray(v, jnp.float32).reshape(-1, 1), (batch, 1))
        blr, blu, brr, bru = map(row, (bl_r, bl_u, br_r, br_u))

        def pad_state(x, fill_rows):
            # [batch, C_actual] -> [C, B]: transpose, pad cells with the
            # right-ghost plateau, pad batch with zeros
            xt = x.T
            xt = jnp.concatenate(
                [xt, jnp.broadcast_to(fill_rows.T, (C - num_cell, batch))],
                axis=0)
            return jnp.pad(xt, ((0, 0), (0, B - batch)))

        bry = arz.compute_y(brr, bru, u_max)
        r_p = pad_state(r0, brr)
        y_p = pad_state(y0, bry)
        pad_b = lambda v: jnp.pad(v.T, ((0, 0), (0, B - batch)),
                                  constant_values=1e-3)
        rT, yT, ms = rollout_padded(r_p, y_p, pad_b(blr), pad_b(blu),
                                    pad_b(brr), pad_b(bru))
        return (rT[:num_cell, :batch].T, yT[:num_cell, :batch].T,
                ms[0, :batch])

    return fn


def make_segmented_macro_rollout(u_max: float, delta_time: float,
                                 cell_length: float, num_steps: int,
                                 num_cell: int, batch: int,
                                 chunk: int = 128, *,
                                 interpret: bool | None = None):
    """Arbitrary-horizon fused rollout: a rematerialized scan of fused
    ``chunk``-step kernels.

    Each chunk runs as one Pallas program (VMEM-resident); the scan carries
    only the (r, y, max_speed) state between chunks and ``jax.checkpoint``
    makes the backward pass re-run each chunk's forward kernel before its
    backward kernel — O(chunk) residual memory for any ``num_steps``.
    ``num_steps`` is rounded up to a multiple of ``chunk`` internally only in
    the sense that the last partial chunk gets its own kernel.
    """
    n_full, rem = divmod(int(num_steps), int(chunk))
    full_fn = make_fused_macro_rollout(u_max, delta_time, cell_length, chunk,
                                       num_cell, batch,
                                       interpret=interpret) if n_full else \
        None
    rem_fn = make_fused_macro_rollout(u_max, delta_time, cell_length, rem,
                                      num_cell, batch,
                                      interpret=interpret) if rem else None

    def fn(r0, y0, bl_r, bl_u, br_r, br_u):
        r = jnp.asarray(r0, jnp.float32).reshape(batch, num_cell)
        y = jnp.asarray(y0, jnp.float32).reshape(batch, num_cell)
        ms = jnp.zeros((batch,), jnp.float32)

        if full_fn is not None:
            @jax.checkpoint
            def body(carry, _):
                r, y, ms = carry
                r, y, cms = full_fn(r, y, bl_r, bl_u, br_r, br_u)
                return (r, y, jnp.maximum(ms, cms)), None

            (r, y, ms), _ = jax.lax.scan(body, (r, y, ms), None,
                                         length=n_full)
        if rem_fn is not None:
            r, y, cms = rem_fn(r, y, bl_r, bl_u, br_r, br_u)
            ms = jnp.maximum(ms, cms)
        return r, y, ms

    return fn
