"""Whole-episode fused Pallas kernel for ITSCP in macro mode.

The scan-based episode (``dhts/apps/control/itscp/env.py``) executes one XLA
launch per simulation step; on tiny per-step state the wall clock is pure
launch/dependency latency. This kernel runs the ENTIRE episode — per-step
signal gates from the phase action, signal-blended ghost-cell boundaries,
the Godunov update for every lane, and the RMS-sharpened soft queue reward —
inside a single Pallas program with all state resident in VMEM, plus a
custom-VJP backward kernel that replays the stored per-step states in
reverse and accumulates the action gradient on-chip.

Dynamic-index vector gathers do not lower on Pallas TPU (see CLAUDE.md), so
every cross-lane read becomes a **one-hot matmul**: per-step routed
adjacency ``adj[l]`` turns into ``iota == adj`` masks contracted against the
per-lane edge-cell vectors on the MXU; static per-lane structure (first/last
cell picks, intersection assignment) is baked as host-precomputed 0/1
matrices.

Scope: macro mode (every lane ARZ — the reference's primary preset,
``run_itscp_macro.sh``), differentiable (training) path, gradient w.r.t. the
action. The hybrid/micro modes keep the scan path.

Layout: cells on sublanes ``[C, Lp]``, lanes padded to 128 on the lane axis;
per-lane rows are ``[1, Lp]``. Residuals: per-step (r, y) trajectories and
the detached RMS sharpness constant.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dhts.ops import arz

_LANE = 128
_SUBLANE = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_fused_itscp_macro_episode(spec, meta, config, *,
                                   interpret: bool | None = None):
    """Build ``fn(action2d, schedule, mnext, mprev, r0, y0) -> (neg_queue_sum,
    queues[T])`` for an all-macro ITSCP scene.

    ``spec``/``meta``: the env's SceneSpec / LaneMeta (host-read);
    ``config``: the env config dict. ``action2d``: ``[n_phases, n_inter]``;
    ``schedule``/``mnext``/``mprev``: ``[T, L]``; ``r0, y0``: ``[L, C]``.
    Differentiable w.r.t. ``action2d``, ``r0`` and ``y0``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # ---- static host-side constants --------------------------------------
    L = int(spec.num_lanes)
    C = int(spec.max_cells)
    Lp = _round_up(L, _LANE)
    Cp = _round_up(C, _SUBLANE)
    T = int(config["policy_length"] * config["duration"] *
            config["simulation_frequency"])
    nsf = config["simulation_frequency"] * config["signal_length"]
    n_phases = max(1, (config["policy_length"] * config["duration"]) //
                   config["signal_length"])
    n_inter = int(config["num_intersection"]) ** 2
    NIp = _round_up(n_inter, _LANE)
    NPp = _round_up(n_phases, _SUBLANE)
    dt = 1.0 / config["simulation_frequency"]
    u_max = float(config["speed_limit"])
    static_speed = float(config["static_speed"])
    veh_len = float(config["vehicle_length"])

    num_cell = np.asarray(spec.num_cell)
    assert bool(np.all(np.asarray(spec.is_macro))), "macro-mode kernel"

    def row(x, dtype=np.float32, fill=0.0):
        out = np.full((1, Lp), fill, dtype)
        out[0, :L] = np.asarray(x)
        return out

    lane_mask = row(np.ones(L), fill=0.0)
    cell_len = row(np.asarray(spec.cell_length), fill=1.0)
    coef = (dt / cell_len).astype(np.float32)
    approaching = row(np.asarray(meta.approaching), fill=0.0)
    is_we = row(np.asarray(meta.is_we), fill=0.0)
    has_prev = row(np.asarray(meta.has_prev), fill=0.0)
    num_prev = row(np.asarray(spec.num_prev), np.int32, 0)
    num_next = row(np.asarray(spec.num_next), np.int32, 0)
    # convert to numpy BEFORE slicing: this factory may be built inside a
    # jit trace (lazily on first use), where jnp slicing would stage a
    # traced op on the concrete closed-over array
    prev0 = row(np.asarray(spec.prev_lanes)[:, 0], np.int32, -1)
    next0 = row(np.asarray(spec.next_lanes)[:, 0], np.int32, -1)

    # cell masks / first-last cell picks: [Cp, Lp]
    cmask = np.zeros((Cp, Lp), np.float32)
    first_pick = np.zeros((Cp, Lp), np.float32)
    last_pick = np.zeros((Cp, Lp), np.float32)
    for li in range(L):
        n = int(num_cell[li])
        cmask[:n, li] = 1.0
        first_pick[0, li] = 1.0
        last_pick[max(n - 1, 0), li] = 1.0

    # intersection assignment: [NIp, Lp] one-hot (action row -> lanes)
    inter_pick = np.zeros((NIp, Lp), np.float32)
    for li in range(L):
        inter_pick[int(np.asarray(meta.inter)[li]), li] = 1.0

    # host-rounded phase-progress table (see env.signal_progress_table):
    # keeps the kernel's signals bit-identical to the scan env's
    NSFp = _round_up(nsf, _SUBLANE)
    prog_tab = np.zeros((NSFp, 1), np.float32)
    prog_tab[:nsf, 0] = np.minimum(np.arange(nsf) / nsf, 1.0)

    consts = dict(lane_mask=lane_mask, cell_len=cell_len, coef=coef,
                  approaching=approaching, is_we=is_we, has_prev=has_prev,
                  num_prev=num_prev, num_next=num_next, prev0=prev0,
                  next0=next0, cmask=cmask, first_pick=first_pick,
                  last_pick=last_pick, inter_pick=inter_pick, prog=prog_tab)

    def soft(x, c):
        return jax.nn.sigmoid(jnp.clip(x * c, -16.0, 16.0))

    def gather_lanes(values_row, idx_row):
        """values_row [1, Lp] re-indexed by idx_row [1, Lp] (one-hot matmul);
        invalid (< 0) indices produce 0. HIGHEST precision: the default MXU
        path truncates the gathered fp32 values to bf16."""
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0) ==
              idx_row).astype(jnp.float32)  # column l = one-hot of idx[l]
        return jnp.dot(values_row, oh, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

    def gather_lanes2(row_a, row_b, idx_row):
        """Two co-indexed gathers in one MXU pass (a [1,Lp] LHS wastes the
        systolic array's rows)."""
        oh = (jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0) ==
              idx_row).astype(jnp.float32)
        g = jnp.dot(jnp.concatenate([row_a, row_b], axis=0), oh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return g[0:1], g[1:2]

    def step(r, y, rms_tot, rms_cnt, t, action2d, sched_t, mnext_t, mprev_t,
             cn):
        """One fused ITSCP-macro step on [Cp, Lp] state. ``cn``: constants."""
        # --- signals (env.lane_signals)
        phase = jnp.minimum(t // nsf, n_phases - 1)
        ph_oh = (jax.lax.broadcasted_iota(jnp.int32, (NPp, 1), 0) ==
                 phase).astype(jnp.float32)
        a_row = jnp.sum(action2d * ph_oh, axis=0, keepdims=True)  # [1, NIp]
        a_lane = jnp.dot(a_row, cn["inter_pick"],
                         preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # [1, Lp]
        pr_oh = (jax.lax.broadcasted_iota(jnp.int32, (NSFp, 1), 0) ==
                 (t % nsf)).astype(jnp.float32)
        progress = jnp.sum(cn["prog"] * pr_oh)
        gate = jnp.where(cn["is_we"] > 0, soft(a_lane - progress, 32.0),
                         soft(progress - a_lane, 32.0))
        sig = jnp.where(cn["approaching"] > 0, gate, 1.0)

        # --- edge cells of every lane
        u = arz.compute_u(r, y, u_max)
        r_last = jnp.sum(r * cn["last_pick"], axis=0, keepdims=True)
        u_last = jnp.sum(u * cn["last_pick"], axis=0, keepdims=True)
        r_first = jnp.sum(r * cn["first_pick"], axis=0, keepdims=True)
        u_first = jnp.sum(u * cn["first_pick"], axis=0, keepdims=True)

        # --- left ghost: schedule inflow or routed/graph neighbor, blended
        # by the predecessor's signal (env itscp boundary_and_step)
        adjp = jnp.where(cn["num_prev"] == 1, cn["prev0"], mprev_t)
        use_nb_l = (cn["num_prev"] > 0) & (adjp >= 0)
        nb_r, nb_u = gather_lanes2(r_last, u_last, adjp)
        hp = cn["has_prev"] > 0
        gl_r = jnp.where(hp, jnp.where(use_nb_l, nb_r, 0.0), sched_t)
        gl_u = jnp.where(hp, jnp.where(use_nb_l, nb_u, u_max),
                         arz.compute_u_eq(sched_t, u_max))
        prev_sig = jnp.where(~hp, 1.0,
                             jnp.where(mprev_t < 0, 0.0,
                                       gather_lanes(sig, mprev_t)))
        bl_r = gl_r * prev_sig
        bl_u = gl_u * prev_sig + u_max * (1.0 - prev_sig)

        # --- right ghost: green neighbor vs red jam wall, own gate
        adjn = jnp.where(cn["num_next"] == 1, cn["next0"], mnext_t)
        use_nb_r = (cn["num_next"] > 0) & (adjn >= 0)
        gn_r, gn_u = gather_lanes2(r_first, u_first, adjn)
        gr_r = jnp.where(use_nb_r, gn_r, 0.0)
        gr_u = jnp.where(use_nb_r, gn_u, u_max)
        s = soft(sig - 0.5, 32.0)
        br_r = gr_r * s + (1.0 - s)
        br_u = gr_u * s

        # --- Godunov update (padding cells pinned to the right ghost)
        br_y = arz.compute_y(br_r, br_u, u_max)
        r = jnp.where(cn["cmask"] > 0, r, br_r)
        y = jnp.where(cn["cmask"] > 0, y, br_y)
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
        new_r = r + (fr[:-1] - fr[1:]) * cn["coef"]
        new_y = y + (fy[:-1] - fy[1:]) * cn["coef"]

        # --- RMS-sharpened soft queue reward (env queue block)
        u_new = arz.compute_u(new_r, new_y, u_max)
        data = (static_speed - u_new) * cn["cmask"]
        rms_tot = rms_tot + jax.lax.stop_gradient(jnp.sum(data))
        rms_cnt = rms_cnt + jnp.sum(cn["cmask"])
        const = 16.0 / jnp.maximum(jnp.abs(rms_tot / rms_cnt), 1e-6)
        stat = soft(static_speed - u_new, const)
        n_veh = new_r * cn["cell_len"] / veh_len
        q_lane = jnp.sum(stat * n_veh * cn["cmask"], axis=0, keepdims=True)
        queue = jnp.sum(q_lane * q_lane * cn["lane_mask"]) * dt

        return new_r, new_y, rms_tot, rms_cnt, queue

    # ---- forward kernel ----------------------------------------------------
    const_names = sorted(consts.keys())

    def fwd_kernel(action_ref, sched_ref, mnext_ref, mprev_ref, r_ref, y_ref,
                   *rest):
        cn = {k: ref[:] for k, ref in zip(const_names,
                                          rest[: len(const_names)])}
        (qsum_ref, queues_ref, traj_r_ref, traj_y_ref,
         rms_ref) = rest[len(const_names):]
        action2d = action_ref[:]

        def body(t, carry):
            r, y, tot, cnt, qsum = carry
            traj_r_ref[t] = r
            traj_y_ref[t] = y
            rms_ref[t] = jnp.stack([tot, cnt]).reshape(1, 2)
            r, y, tot, cnt, queue = step(r, y, tot, cnt, t, action2d,
                                         sched_ref[t], mnext_ref[t],
                                         mprev_ref[t], cn)
            queues_ref[t] = queue.reshape(1, 1)
            return (r, y, tot, cnt, qsum + queue)

        zero = jnp.zeros((), jnp.float32)
        r, y, tot, cnt, qsum = jax.lax.fori_loop(
            0, T, body, (r_ref[:], y_ref[:], zero, zero, zero))
        qsum_ref[:] = qsum.reshape(1, 1)

    def run_forward(action2d, sched, mnext, mprev, r0, y0):
        return pl.pallas_call(
            fwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), jnp.float32),  # queue sum
                jax.ShapeDtypeStruct((T, 1, 1), jnp.float32),  # queues
                jax.ShapeDtypeStruct((T, Cp, Lp), jnp.float32),  # traj r
                jax.ShapeDtypeStruct((T, Cp, Lp), jnp.float32),  # traj y
                jax.ShapeDtypeStruct((T, 1, 2), jnp.float32),  # rms state
            ),
            interpret=interpret,
        )(action2d, sched, mnext, mprev, r0, y0,
          *(consts[k] for k in const_names))

    # ---- backward kernel ----------------------------------------------------
    def bwd_kernel(action_ref, sched_ref, mnext_ref, mprev_ref, traj_r_ref,
                   traj_y_ref, rms_ref, g_qsum_ref, g_queues_ref, *rest):
        cn = {k: ref[:] for k, ref in zip(const_names,
                                          rest[: len(const_names)])}
        g_action_ref, g_r0_ref, g_y0_ref = rest[len(const_names):]
        action2d = action_ref[:]
        g_qsum = g_qsum_ref[0, 0]

        def body(i, carry):
            gr, gy, ga = carry
            t = T - 1 - i
            r = traj_r_ref[t]
            y = traj_y_ref[t]
            tot = rms_ref[t][0, 0]
            cnt = rms_ref[t][0, 1]
            gq = g_qsum + g_queues_ref[t][0, 0]

            def fwd_t(r_, y_, a_):
                nr, ny, _, _, queue = step(r_, y_, tot, cnt, t, a_,
                                           sched_ref[t], mnext_ref[t],
                                           mprev_ref[t], cn)
                return nr, ny, queue

            _, vjp = jax.vjp(fwd_t, r, y, action2d)
            dr, dy, da = vjp((gr, gy, gq))
            return (dr, dy, ga + da)

        zero_a = jnp.zeros((NPp, NIp), jnp.float32)
        init = (jnp.zeros((Cp, Lp), jnp.float32),
                jnp.zeros((Cp, Lp), jnp.float32), zero_a)
        gr, gy, ga = jax.lax.fori_loop(0, T, body, init)
        g_action_ref[:] = ga
        g_r0_ref[:] = gr
        g_y0_ref[:] = gy

    def run_backward(action2d, sched, mnext, mprev, traj_r, traj_y, rms,
                     g_qsum, g_queues):
        return pl.pallas_call(
            bwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((NPp, NIp), jnp.float32),
                jax.ShapeDtypeStruct((Cp, Lp), jnp.float32),
                jax.ShapeDtypeStruct((Cp, Lp), jnp.float32),
            ),
            interpret=interpret,
        )(action2d, sched, mnext, mprev, traj_r, traj_y, rms, g_qsum,
          g_queues, *(consts[k] for k in const_names))

    # ---- custom-VJP wrapper --------------------------------------------------
    @jax.custom_vjp
    def episode_padded(action2d, sched, mnext, mprev, r0, y0):
        qsum, queues, _, _, _ = run_forward(action2d, sched, mnext, mprev,
                                            r0, y0)
        return qsum[0, 0], queues[:, 0, 0]

    def ep_fwd(action2d, sched, mnext, mprev, r0, y0):
        qsum, queues, tr, ty, rms = run_forward(action2d, sched, mnext,
                                                mprev, r0, y0)
        return (qsum[0, 0], queues[:, 0, 0]), (action2d, sched, mnext, mprev,
                                               tr, ty, rms)

    def ep_bwd(res, cots):
        action2d, sched, mnext, mprev, tr, ty, rms = res
        g_qsum, g_queues = cots
        ga, gr0, gy0 = run_backward(
            action2d, sched, mnext, mprev, tr, ty, rms,
            jnp.reshape(g_qsum, (1, 1)),
            jnp.reshape(g_queues, (T, 1, 1)))
        return ga, None, None, None, gr0, gy0

    episode_padded.defvjp(ep_fwd, ep_bwd)

    # ---- public API over unpadded arrays -------------------------------------
    def fn(action2d, schedule, mnext, mprev, r0, y0):
        action_p = jnp.zeros((NPp, NIp), jnp.float32).at[
            :n_phases, :n_inter].set(action2d)
        pad_t = lambda x, fill: jnp.pad(
            jnp.asarray(x), ((0, 0), (0, Lp - L)), constant_values=fill)
        sched_p = pad_t(schedule.astype(jnp.float32), 0.0)
        mnext_p = pad_t(mnext.astype(jnp.int32), -1)
        mprev_p = pad_t(mprev.astype(jnp.int32), -1)
        pad_s = lambda x: jnp.pad(
            jnp.asarray(x, jnp.float32).T, ((0, Cp - C), (0, Lp - L)))
        qsum, queues = episode_padded(action_p, sched_p, mnext_p, mprev_p,
                                      pad_s(r0), pad_s(y0))
        return -qsum, queues  # reward = -sum of squared queues

    residual_mb = 2 * T * Cp * Lp * 4 / 2**20
    fn.residual_mb = residual_mb  # informational
    return fn
