"""Spatially-sharded FUSED ITSCP episode: per-shard Pallas step kernels.

Round-1 shipped two performance pillars that did not compose: the fused
whole-episode kernel (single device only) and the explicit-collective
spatial sharding (wrapping the ~100-XLA-op scan step, ~30x slower per
step). This module is the composition: the scene's lane axis is sharded
over a mesh axis, and each device runs its local share of every simulation
step as single-block Pallas kernels between explicit collectives:

====  =====================================================================
A     local state -> pre-physics summary rows + injection bit   [9, l]
      --- all_gather (lane axis) -> gA [9, L] ---
B     apply injection; signal-blended macro ghosts; leader walk over the
      gathered tail/count rows; per-head signal attribution (fsig) +
      sg-RMS partial sums
      --- psum (2 scalars) -> signal sigmoid constant ---
C     soft/hard signal blend of the head deltas; Godunov + IDM physics;
      flux-capacitor accumulation; post-physics summary rows [15+3+R, l]
      (incl. the head's next route lane, looked up locally)
      --- all_gather -> gF / gI / gRoute ---
D1    LOCAL want-computation: destination probes at mnext/hnext
      ([Lgp, 2*l] gather), want/target rows per local source
      --- all_gather -> want rows [3, L] ---
D2    LOCAL arbitration: each local DESTINATION scans its K static
      predecessors over the gathered want rows ([Lgp, K*l] gather)
      --- all_gather -> verdict rows [2, L] ---
D3    LOCAL win verdicts at mnext/hnext, removals, inserts, deposits;
      is-static-RMS partials; LOCAL event partials
      --- psum (2 scalars) -> queue sigmoid constant ---
E     RMS-sharpened soft queue -> per-step local queue partial
====  =====================================================================

Every one-hot matmul above is [Lgp, c * l_loc]: per-device FLOPs and bytes
are O(Lg * l_loc) and shrink linearly with the shard count (round 2
recomputed the arbitration globally on every device — an O(Lg^2)/device
term that did not shrink). Queue partials, event partials, injection
counts, and CFL maxima are summed over the scan and reduced ONCE per
episode (round 2 paid 2 extra per-step collectives for them).

On a 1-shard lane axis every collective is an identity, so the WHOLE step
fuses into ONE kernel (A+B+C+conversion+E with the RMS psums inlined) —
1 launch/step (+1 for its backward), zero collectives, against round 2's
5 launches + 3 collectives.

Step formulas mirror ``dhts/ops/pallas/itscp_hybrid_episode.py::step`` (the
single-device kernel, parity-tested against the scan env and the PyTorch
reference) with every cross-lane read routed through the gathered
summaries. Reductions run over differently padded axes than the scan
path, so parity vs ``make_spatial_episode`` is tight-tolerance (~1e-5),
not bit-exact (tests/test_spatial_fused.py). Vehicle ids are not tracked
(the episode result never exposes them).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dhts.ops import arz, idm
from dhts.ops.pallas import _compat  # noqa: F401
from dhts.ops.pallas.dkernel import make_dkernel, make_kernel_sg

_LANE = 128
_SUBLANE = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_fused_spatial_episode(env, mesh: Mesh, differentiable: bool = True,
                               axis_name: str = "lane",
                               interpret: bool | None = None):
    """Build ``episode(action_flat, key) -> EpisodeResult`` running the
    fused per-shard step kernels under ``shard_map``.

    Starts from the EMPTY network state (the ITSCP initial condition,
    like the whole-episode kernel); ``env.base_state`` supplies shapes and
    the emission route pool, not initial vehicles."""
    from dhts.apps.control.itscp.env import EpisodeResult

    spec, meta, config = env.spec, env.meta, dict(env.config)
    state0, data = env.base_state, env.data
    L = int(spec.num_lanes)
    n_shard = int(mesh.shape[axis_name])
    assert L % n_shard == 0, (L, n_shard)
    l_loc = L // n_shard
    lp = _round_up(l_loc, _LANE)
    Lgp = _round_up(L, _LANE)
    C = int(spec.max_cells)
    Cp = _round_up(C, _SUBLANE)
    V = int(state0.micro.position.shape[1])
    Vp = _round_up(V, _SUBLANE)
    R = int(state0.micro.route.shape[2])
    K = int(np.asarray(spec.next_lanes).shape[1])
    P_inj = int(data.inj_routes.shape[1])
    P_emit = int(state0.route_pool.shape[1])
    T = int(env.num_timestep)
    nsf = config["simulation_frequency"] * config["signal_length"]
    n_phases = max(1, (config["policy_length"] * config["duration"]) //
                   config["signal_length"])
    n_inter = config["num_intersection"] ** 2
    NIp = _round_up(n_inter, _LANE)
    NPp = _round_up(n_phases, _SUBLANE)
    NSFp = _round_up(nsf, _SUBLANE)
    dt = 1.0 / config["simulation_frequency"]
    gsc = float(config.get("soft_gate_scale", 1.0))
    u_max = float(config["speed_limit"])
    static_speed = float(config["static_speed"])
    veh_len = float(config["vehicle_length"])
    diff = differentiable
    win = max(1, min(int(getattr(env, "_fused_win_needed", R - 1)), R - 1))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # ---- static constants --------------------------------------------------
    def grow(x, dtype=np.float32, fill=0.0):
        out = np.full((1, Lgp), fill, dtype)
        out[0, :L] = np.asarray(x)
        return out

    def lrow(x, dtype=np.float32, fill=0.0):
        out = np.full((n_shard, 1, lp), fill, dtype)
        out[:, 0, :l_loc] = np.asarray(x).reshape(n_shard, l_loc)
        return out

    num_cell = np.asarray(spec.num_cell)
    is_macro_np = np.asarray(spec.is_macro)
    prev_np = np.asarray(spec.prev_lanes)
    prev_k_g = np.full((K, Lgp), -1, np.int32)
    prev_k_g[:, :L] = prev_np.T
    inter_pick_g = np.zeros((NIp, Lgp), np.float32)
    for li in range(L):
        inter_pick_g[int(np.asarray(meta.inter)[li]), li] = 1.0
    prog_tab = np.zeros((NSFp, 1), np.float32)
    prog_tab[:nsf, 0] = np.minimum(np.arange(nsf) / nsf, 1.0)
    G = dict(
        is_macro_g=grow(is_macro_np.astype(np.float32)),
        length_g=grow(np.asarray(spec.length), fill=1.0),
        real_g=grow(np.ones(L)),
        appr_g=grow(np.asarray(meta.approaching)),
        is_we_g=grow(np.asarray(meta.is_we)),
        prev_k_g=prev_k_g, inter_pick_g=inter_pick_g, prog=prog_tab)
    G = {k: jnp.asarray(v) for k, v in G.items()}
    g_names = sorted(G.keys())

    lc = dict(
        lane_mask=lrow(np.ones(L)),
        is_macro=lrow(is_macro_np.astype(np.float32)),
        length=lrow(np.asarray(spec.length), fill=1.0),
        cell_len=lrow(np.asarray(spec.cell_length), fill=1.0),
        has_prev=lrow(np.asarray(meta.has_prev)),
        num_prev=lrow(np.asarray(spec.num_prev), np.int32),
        num_next=lrow(np.asarray(spec.num_next), np.int32),
        prev0=lrow(prev_np[:, 0], np.int32, -1),
        next0=lrow(np.asarray(spec.next_lanes)[:, 0], np.int32, -1),
        gid=lrow(np.arange(L), np.int32, -1),
    )
    lc["coef"] = (dt / lc["cell_len"]).astype(np.float32)
    next_k_l = np.full((n_shard, K, lp), -1, np.int32)
    next_k_l[:, :, :l_loc] = np.asarray(spec.next_lanes).reshape(
        n_shard, l_loc, K).transpose(0, 2, 1)
    lc["next_k"] = next_k_l
    prev_k_l = np.full((n_shard, K, lp), -1, np.int32)
    prev_k_l[:, :, :l_loc] = prev_np.reshape(
        n_shard, l_loc, K).transpose(0, 2, 1)
    lc["prev_k"] = prev_k_l
    # the K predecessor rows laid side by side as ONE [1, K*lp] row
    # (in-kernel concat of sublane slices does not lower on Mosaic)
    lc["prev_cat"] = prev_k_l.reshape(n_shard, 1, K * lp)
    cmask = np.zeros((n_shard, Cp, lp), np.float32)
    first_pick = np.zeros((n_shard, Cp, lp), np.float32)
    last_pick = np.zeros((n_shard, Cp, lp), np.float32)
    for li in range(L):
        s, j = li // l_loc, li % l_loc
        if is_macro_np[li]:
            cmask[s, : int(num_cell[li]), j] = 1.0
            first_pick[s, 0, j] = 1.0
            last_pick[s, max(int(num_cell[li]) - 1, 0), j] = 1.0
    lc.update(cmask=cmask, first_pick=first_pick, last_pick=last_pick)
    lc_names = sorted(lc.keys())
    dflt = dict(accel_max=u_max, accel_pref=0.8 * u_max,
                target_speed=0.9 * u_max, min_space=0.1 * veh_len,
                time_pref=0.1, length=veh_len)

    # routes, lane-minor per shard
    inj_np = np.asarray(data.inj_routes)  # [L, P, R]
    inj_l = np.full((n_shard, P_inj, R, lp), -1, np.int32)
    inj_l[:, :, :, :l_loc] = inj_np.reshape(
        n_shard, l_loc, P_inj, R).transpose(0, 2, 3, 1)
    pool_np = np.asarray(state0.route_pool)
    pool_l = np.full((n_shard, P_emit, R, lp), -1, np.int32)
    pool_l[:, :, :, :l_loc] = pool_np.reshape(
        n_shard, l_loc, P_emit, R).transpose(0, 2, 3, 1)

    # ---- small helpers -----------------------------------------------------
    def soft(x, c):
        return jax.nn.sigmoid(jnp.clip(x * c, -16.0, 16.0))

    def gate(x, c):
        return soft(x, c) if diff else (x > 0).astype(jnp.float32)

    def oh(idx_row, rows, cols):
        return (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) ==
                idx_row).astype(jnp.float32)

    def gat(rows, idx_row, n_rows_src, n_cols, prebuilt=None):
        mat = jnp.concatenate(rows, axis=0)
        o = oh(idx_row, n_rows_src, n_cols) if prebuilt is None else prebuilt
        return jnp.dot(mat, o, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def gat_sg(rows, idx_row, n_rows_src, n_cols, prebuilt=None):
        return jax.lax.stop_gradient(gat(rows, idx_row, n_rows_src, n_cols,
                                         prebuilt))

    def head_oh(count):
        h = jnp.maximum(count - 1, 0)
        return (jax.lax.broadcasted_iota(jnp.int32, (Vp, lp), 0) ==
                h).astype(jnp.float32)

    def pick_v(arr, ohv):
        return jnp.sum(arr * ohv, axis=0, keepdims=True)

    def pick_route(route, ohv):
        return jnp.sum(route * ohv[:, None, :], axis=0)

    def pick_r(route_rl, j_row, cols):
        ohr = ((jax.lax.broadcasted_iota(jnp.int32, (R, cols), 0) == j_row) &
               (j_row >= 0) & (j_row < R)).astype(jnp.float32)
        val = jnp.sum(route_rl.astype(jnp.float32) * ohr, axis=0,
                      keepdims=True)
        return jnp.where((j_row >= 0) & (j_row < R), val.astype(jnp.int32),
                         -1)

    def tail_insert(arr, new_row, mask_row):
        shifted = jnp.concatenate([new_row[None], arr[:-1]], axis=0)
        return jnp.where(mask_row, shifted, arr)

    def _consts(rest):
        return (dict(zip(lc_names, rest[:len(lc_names)])),
                dict(zip(g_names, rest[len(lc_names):])))

    def lane_sig_global(action2d, t, gd):
        phase = jnp.minimum(t // nsf, n_phases - 1)
        ph_oh = (jax.lax.broadcasted_iota(jnp.int32, (NPp, 1), 0) ==
                 phase).astype(jnp.float32)
        a_row = jnp.sum(action2d * ph_oh, axis=0, keepdims=True)
        a_lane = jnp.dot(a_row, gd["inter_pick_g"],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        pr_oh = (jax.lax.broadcasted_iota(jnp.int32, (NSFp, 1), 0) ==
                 (t % nsf)).astype(jnp.float32)
        progress = jnp.sum(gd["prog"] * pr_oh)
        g_axis = jnp.where(gd["is_we_g"] > 0,
                           gate(a_lane - progress, 32.0 * gsc),
                           gate(progress - a_lane, 32.0 * gsc))
        return jnp.where(gd["appr_g"] > 0, g_axis, 1.0)

    def mean_of(part):  # part: [1,2] (sum, count) accumulated
        return part[0, 0] / jnp.maximum(part[0, 1], 1.0)

    CNAMES = ("r", "y", "pos", "vel", "av", "p_amax", "p_apref", "p_vt",
              "p_ms", "p_tp", "p_len", "count", "route", "ridx", "cap",
              "inj_left", "cursor")
    N_CARRY = len(CNAMES)
    CARRY_DIFF = (0, 1, 2, 3, 4, 14)  # r y pos vel av cap

    def carry_of(args):
        return dict(zip(CNAMES, args))

    # ======================================================================
    # kernel bodies
    # ======================================================================
    def body_A(*args):
        cy = carry_of(args[:N_CARRY])
        rand_t, sched_t = args[N_CARRY], args[N_CARRY + 1]
        cn, gd = _consts(args[N_CARRY + 2:])
        u = arz.compute_u(cy["r"], cy["y"], u_max)
        r_first = jnp.sum(cy["r"] * cn["first_pick"], axis=0, keepdims=True)
        u_first = jnp.sum(u * cn["first_pick"], axis=0, keepdims=True)
        r_last = jnp.sum(cy["r"] * cn["last_pick"], axis=0, keepdims=True)
        u_last = jnp.sum(u * cn["last_pick"], axis=0, keepdims=True)
        incoming = jnp.where(cn["has_prev"] > 0, -1.0, sched_t)
        free = jnp.where(cy["count"] > 0,
                         cy["pos"][:1] - 0.5 * cy["p_len"][:1],
                         cn["length"])
        inject = ((cn["has_prev"] == 0) & (cn["is_macro"] < 0.5) &
                  (free > 0.5 * veh_len) & (rand_t < incoming) &
                  (cy["inj_left"] > 0) & (cy["count"] < V) &
                  (cn["lane_mask"] > 0))
        sumA = jnp.concatenate([
            r_first, u_first, r_last, u_last,
            cy["count"].astype(jnp.float32), cy["pos"][:1], cy["vel"][:1],
            cy["p_len"][:1], inject.astype(jnp.float32)], axis=0)
        return (sumA,)

    def body_B(*args):
        cy = carry_of(args[:N_CARRY])
        gA, action2d, t2d, mnext_t, mprev_t, sched_t, inj_routes = args[
            N_CARRY: N_CARRY + 7]
        cn, gd = _consts(args[N_CARRY + 7:])
        t = t2d[0, 0]
        incoming = jnp.where(cn["has_prev"] > 0, -1.0, sched_t)
        sig_g = lane_sig_global(action2d, t, gd)
        sig = gat([sig_g], cn["gid"], Lgp, lp)
        sig = jnp.where(cn["lane_mask"] > 0, sig, 1.0)

        g_inj = gA[8:9] > 0.5
        gcount = gA[4:5] + g_inj.astype(jnp.float32)
        gtail_pos = jnp.where(g_inj, 0.0, gA[5:6])
        gtail_vel = jnp.where(g_inj, 0.0, gA[6:7])
        gtail_len = jnp.where(g_inj, veh_len, gA[7:8])

        # ---- apply the local injections (bit sliced from the summary)
        inject = (gat_sg([gA[8:9]], cn["gid"], Lgp, lp) > 0.5) & \
            (cn["lane_mask"] > 0)
        pool_idx = jnp.clip(P_inj - cy["inj_left"], 0, P_inj - 1)
        ohp = ((jax.lax.broadcasted_iota(jnp.int32, (P_inj, 1, lp), 0) ==
                pool_idx[None]).astype(jnp.float32))
        new_route = jnp.sum(inj_routes.astype(jnp.float32) * ohp,
                            axis=0).astype(jnp.int32)
        im = inject
        pos = tail_insert(cy["pos"], jnp.zeros((lp,)), im)
        vel = tail_insert(cy["vel"], jnp.zeros((lp,)), im)
        av = tail_insert(cy["av"], jnp.full((lp,), veh_len), im)
        p_amax = tail_insert(cy["p_amax"],
                             jnp.full((lp,), dflt["accel_max"]), im)
        p_apref = tail_insert(cy["p_apref"],
                              jnp.full((lp,), dflt["accel_pref"]), im)
        p_vt = tail_insert(cy["p_vt"],
                           jnp.full((lp,), dflt["target_speed"]), im)
        p_ms = tail_insert(cy["p_ms"], jnp.full((lp,), dflt["min_space"]),
                           im)
        p_tp = tail_insert(cy["p_tp"], jnp.full((lp,), dflt["time_pref"]),
                           im)
        p_len = tail_insert(cy["p_len"], jnp.full((lp,), dflt["length"]),
                            im)
        route = jnp.where(im[None], jnp.concatenate(
            [new_route[None], cy["route"][:-1]], axis=0), cy["route"])
        ridx = tail_insert(cy["ridx"], jnp.zeros((lp,), jnp.int32), im)
        count = cy["count"] + im.astype(jnp.int32)
        inj_left = cy["inj_left"] - im.astype(jnp.int32)
        n_inj = jnp.sum(im.astype(jnp.float32)).reshape(1, 1)

        # ---- macro ghosts (summary-sourced)
        hp_b = cn["has_prev"] > 0
        adjp = jnp.where(cn["num_prev"] == 1, cn["prev0"], mprev_t)
        gp = gat([gd["is_macro_g"], gA[2:3], gA[3:4]], adjp, Lgp, lp)
        use_nb_l = (cn["num_prev"] > 0) & (adjp >= 0) & (gp[0:1] > 0.5)
        gl_r = jnp.where(hp_b, jnp.where(use_nb_l, gp[1:2], 0.0), incoming)
        gl_u = jnp.where(hp_b, jnp.where(use_nb_l, gp[2:3], u_max),
                         arz.compute_u_eq(incoming, u_max))
        prev_sig = jnp.where(~hp_b, 1.0,
                             jnp.where(mprev_t < 0, 0.0,
                                       gat([sig_g], mprev_t, Lgp, lp)))
        bl_r = gl_r * prev_sig
        bl_u = gl_u * prev_sig + u_max * (1.0 - prev_sig)
        adjn = jnp.where(cn["num_next"] == 1, cn["next0"], mnext_t)
        gn = gat([gd["is_macro_g"], gA[0:1], gA[1:2]], adjn, Lgp, lp)
        use_nb_r = (cn["num_next"] > 0) & (adjn >= 0) & (gn[0:1] > 0.5)
        gr_r = jnp.where(use_nb_r, gn[1:2], 0.0)
        gr_u = jnp.where(use_nb_r, gn[2:3], u_max)

        # ---- leader walk
        ohv_h = head_oh(count)
        hv_pos = pick_v(pos, ohv_h)
        hv_vel = pick_v(vel, ohv_h)
        hv_len = pick_v(p_len, ohv_h)
        route_h = pick_route(route, ohv_h)
        ridx_h = pick_v(ridx.astype(jnp.float32), ohv_h).astype(jnp.int32)
        h_exists = (count > 0) & (cn["lane_mask"] > 0)
        base = cn["length"] - hv_pos - hv_len * 0.5
        done = ~h_exists
        found = jnp.zeros((1, lp), jnp.bool_)
        wstar = jnp.full((1, lp), -1, jnp.int32)
        cdel_st = jnp.zeros((1, lp))
        cur_delta = base
        for o in range(win):
            j = ridx_h + 1 + o
            wl = pick_r(route_h, j, lp)
            exists = wl >= 0
            gw = gat_sg([gd["is_macro_g"], gcount, gd["length_g"]], wl, Lgp,
                        lp)
            w_macro = gw[0:1] > 0.5
            occupied = exists & ~w_macro & (gw[1:2] > 0.5)
            term_default = ~done & (~exists | (exists & w_macro))
            term_leader = ~done & occupied
            wstar = jnp.where(term_leader, wl, wstar)
            cdel_st = jnp.where(term_leader,
                                jax.lax.stop_gradient(cur_delta), cdel_st)
            found = found | term_leader
            done = done | term_default | term_leader
            cur_delta = jnp.where(~done, cur_delta + gw[2:3], cur_delta)
        gt = gat([gtail_pos, gtail_vel, gtail_len],
                 jnp.where(found, wstar, -1), Lgp, lp)
        cdel = cdel_st + (base - jax.lax.stop_gradient(base))
        new_pd = jnp.maximum(cdel + gt[0:1] - gt[2:3] * 0.5, 0.0)
        pd_g = jnp.where(found, new_pd, 1000.0)
        sd_g = jnp.where(found, hv_vel - gt[1:2], 0.0)

        # ---- fsig
        red_pd = jnp.maximum(cn["length"] - hv_pos - hv_len * 0.5, 0.0)
        prev_l = pick_r(route_h, ridx_h - 1, lp)
        next_l = pick_r(route_h, ridx_h + 1, lp)
        curr_l = pick_r(route_h, ridx_h, lp)
        prev_exist = prev_l >= 0
        next_exist = next_l >= 0
        if diff:
            p_sc = jnp.where(prev_exist, soft(-hv_pos, 16.0), 0.0)
            c_sc = soft(hv_pos, 16.0) * soft(cn["length"] - hv_pos, 16.0)
            n_sc = jnp.where(next_exist, soft(hv_pos - cn["length"], 16.0),
                             0.0)
        else:
            p_sc = jnp.zeros((1, lp))
            c_sc = jnp.ones((1, lp))
            n_sc = jnp.zeros((1, lp))
        ssum = p_sc + c_sc + n_sc
        p_sc, c_sc, n_sc = p_sc / ssum, c_sc / ssum, n_sc / ssum
        oh3 = jnp.concatenate([oh(curr_l, Lgp, lp), oh(prev_l, Lgp, lp),
                               oh(next_l, Lgp, lp)], axis=1)
        sig3 = jnp.dot(sig_g, oh3, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        fsig = c_sc * sig3[:, :lp]
        fsig += jnp.where(prev_exist, p_sc * sig3[:, lp:2 * lp], 0.0)
        fsig += jnp.where(next_exist, n_sc * sig3[:, 2 * lp:], 0.0)
        blend_f = (h_exists & (cn["is_macro"] < 0.5)).astype(jnp.float32)
        sg_part = jax.lax.stop_gradient(jnp.concatenate(
            [jnp.sum(fsig * blend_f).reshape(1, 1),
             jnp.sum(blend_f).reshape(1, 1)], axis=1))

        return (pos, vel, av, p_amax, p_apref, p_vt, p_ms, p_tp, p_len,
                count, route, ridx, inj_left, bl_r, bl_u, gr_r, gr_u, sig,
                pd_g, sd_g, red_pd, fsig, blend_f, n_inj, sg_part)

    def body_C(*args):
        cy = carry_of(args[:N_CARRY])
        (bl_r, bl_u, gr_r, gr_u, sig, pd_g, sd_g, red_pd, fsig, blend_f,
         c_sig, mnext_t) = args[N_CARRY: N_CARRY + 12]
        cn, gd = _consts(args[N_CARRY + 12:])
        r, y, pos, vel = cy["r"], cy["y"], cy["pos"], cy["vel"]
        count, p_len = cy["count"], cy["p_len"]

        if diff:
            fs = soft(fsig - 0.5, c_sig[0, 0])
            pd = pd_g * fs + red_pd * (1.0 - fs)
            sd = sd_g * fs
        else:
            green = fsig >= 0.5
            pd = jnp.where(green, pd_g, red_pd)
            sd = jnp.where(green, sd_g, 0.0)
        blend = blend_f > 0.5
        pd = jnp.where(blend, pd, pd_g)
        sd = jnp.where(blend, sd, sd_g)
        s_own = soft(sig - 0.5, 32.0 * gsc) if diff else \
            (sig > 0.5).astype(jnp.float32)
        br_r = gr_r * s_own + (1.0 - s_own)
        br_u = gr_u * s_own

        br_y = arz.compute_y(br_r, br_u, u_max)
        r = jnp.where(cn["cmask"] > 0, r, br_r)
        y = jnp.where(cn["cmask"] > 0, y, br_y)
        u = arz.compute_u(r, y, u_max)
        bl_y = arz.compute_y(bl_r, bl_u, u_max)
        rl = jnp.concatenate([bl_r, r], axis=0)
        yl = jnp.concatenate([bl_y, y], axis=0)
        ul = jnp.concatenate([bl_u, u], axis=0)
        rr_ = jnp.concatenate([r, br_r], axis=0)
        ur_ = jnp.concatenate([u, br_u], axis=0)
        sol = arz.riemann_solve(rl, yl, ul, rr_, ur_, u_max)
        max_wave = jnp.max(jnp.maximum(jnp.abs(sol.speed0),
                                       jnp.abs(sol.speed1)) *
                           cn["is_macro"]).reshape(1, 1)
        fr = sol.r0 * sol.u0
        fy = sol.y0 * sol.u0
        r = jnp.where(cn["cmask"] > 0, r + (fr[:-1] - fr[1:]) * cn["coef"],
                      r)
        y = jnp.where(cn["cmask"] > 0, y + (fy[:-1] - fy[1:]) * cn["coef"],
                      y)

        lead_pos = jnp.concatenate([pos[1:], jnp.zeros((1, lp))], axis=0)
        lead_vel = jnp.concatenate([vel[1:], jnp.zeros((1, lp))], axis=0)
        lead_len = jnp.concatenate([p_len[1:], p_len[:1]], axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Vp, lp), 0)
        active = rows < count
        is_head = rows == (count - 1)
        gap = jnp.abs(lead_pos - pos) - (lead_len + p_len) * 0.5
        dv = vel - lead_vel
        gap = jnp.where(is_head, pd, gap)
        dv = jnp.where(is_head, sd, dv)
        coll = gap < 0.0
        gap = jnp.maximum(jnp.where(coll, 0.0, gap), idm.POSITION_DELTA_EPS)
        dv = jnp.where(coll, 0.0, dv)
        res = idm.idm_acceleration(cy["p_amax"], cy["p_apref"], vel,
                                   cy["p_vt"], gap, dv, cy["p_ms"],
                                   cy["p_tp"], dt)
        acc = jnp.where(active, res.acceleration, 0.0)
        pos = jnp.where(active, pos + dt * vel, pos)
        vel = jnp.where(active, vel + dt * acc, vel)

        u = arz.compute_u(r, y, u_max)
        r_last = jnp.sum(r * cn["last_pick"], axis=0, keepdims=True)
        u_last = jnp.sum(u * cn["last_pick"], axis=0, keepdims=True)
        macro_src = (cn["is_macro"] > 0) & (mnext_t >= 0)
        gmn = gat_sg([gd["is_macro_g"]], mnext_t, Lgp, lp)
        next_is_micro = macro_src & (gmn[0:1] < 0.5)
        inc = jnp.where(next_is_micro, r_last * u_last * dt, 0.0)
        slot_oh = ((cn["next_k"] == mnext_t) &
                   (cn["next_k"] >= 0)).astype(jnp.float32)
        cap = cy["cap"] + slot_oh * inc
        cap_val = jnp.sum(cap * slot_oh, axis=0, keepdims=True)

        ohv_h = head_oh(count)
        sumF = jnp.concatenate([
            r_last, u_last, count.astype(jnp.float32), pos[:1], p_len[:1],
            cap_val, pick_v(pos, ohv_h), pick_v(vel, ohv_h),
            pick_v(p_len, ohv_h), pick_v(cy["av"], ohv_h),
            pick_v(cy["p_amax"], ohv_h), pick_v(cy["p_apref"], ohv_h),
            pick_v(cy["p_vt"], ohv_h), pick_v(cy["p_ms"], ohv_h),
            pick_v(cy["p_tp"], ohv_h)], axis=0)
        ridx_h = pick_v(cy["ridx"].astype(jnp.float32),
                        ohv_h).astype(jnp.int32)
        # int32 on purpose: route ids are discrete, and an f32 route_h
        # output would demand a (float0) cotangent once a downstream
        # kernel consumes it as an integer input
        route_h = pick_route(cy["route"], ohv_h).astype(jnp.int32)
        # the head's NEXT route lane is a local route lookup — computing
        # it here (instead of from the gathered global route container in
        # the conversion kernel) keeps the conversion's per-device work
        # O(Lg * l_loc): no [R, Lg] global route pick is ever built
        hnext = pick_r(route_h, ridx_h + 1, lp)
        sumI = jnp.concatenate([mnext_t, ridx_h, hnext], axis=0)
        return (r, y, pos, vel, cap, max_wave, sumF, sumI, route_h)

    # rows of the gathered post summary gF
    F_RLAST, F_ULAST, F_COUNT, F_TPOS, F_TLEN, F_CAP = 0, 1, 2, 3, 4, 5
    F_HPOS, F_HVEL, F_HLEN, F_HA = 6, 7, 8, 9
    F_AMAX, F_APREF, F_VT, F_MS, F_TP = 10, 11, 12, 13, 14

    def body_D1(*args):
        """Conversion phase 1 — LOCAL want-computation: per local source
        lane, probe the (globally gathered) destination rows at mnext and
        at the head's next route lane, and emit the want/target rows that
        arbitration needs. Every one-hot here is [Lgp, 2*lp]: per-device
        work O(Lg * l_loc)."""
        cy = carry_of(args[:N_CARRY])
        sumF, sumI, gF, gI = args[N_CARRY: N_CARRY + 4]
        cn, gd = _consts(args[N_CARRY + 4:])
        lm = cn["lane_mask"] > 0
        mn = sumI[0:1]
        hnext = sumI[2:3]
        # destination probes per family (a lane-axis concat of sumI row
        # slices at different sublane offsets does not lower on Mosaic,
        # so the two index rows cannot share one wide gather)
        gmn = gat_sg([gd["is_macro_g"], gF[F_COUNT:F_COUNT + 1],
                      gF[F_TPOS:F_TPOS + 1], gF[F_TLEN:F_TLEN + 1],
                      gd["length_g"]], mn, Lgp, lp)
        ghn = gat_sg([gd["is_macro_g"], gF[F_COUNT:F_COUNT + 1]], hnext,
                     Lgp, lp)
        next_is_micro = ((cn["is_macro"] > 0) & (mn >= 0) &
                         (gmn[0:1] < 0.5) & lm)
        dest_count = gmn[1:2]
        free_n = jnp.where(dest_count > 0.5, gmn[2:3] - 0.5 * gmn[3:4],
                           gmn[4:5])
        cap_val = sumF[F_CAP:F_CAP + 1]
        want_emit = (next_is_micro &
                     (jax.lax.stop_gradient(cap_val) >= veh_len) &
                     (free_n >= veh_len) & (dest_count < V))
        h_exists = (cy["count"] > 0) & lm
        past_end = h_exists & (sumF[F_HPOS:F_HPOS + 1] >= cn["length"])
        hn_macro = (hnext >= 0) & (ghn[0:1] > 0.5)
        hn_micro = (hnext >= 0) & ~hn_macro
        exit_none = past_end & (hnext < 0)
        want_tr = past_end & hn_micro & (ghn[1:2] < V)
        want_dep = h_exists & hn_macro & (
            sumF[F_HPOS:F_HPOS + 1] > cn["length"] +
            sumF[F_HLEN:F_HLEN + 1])
        wrow = jnp.concatenate(
            [want_emit.astype(jnp.float32),
             jnp.where(want_tr, hnext, -2).astype(jnp.float32),
             jnp.where(want_dep, hnext, -2).astype(jnp.float32)], axis=0)
        pred = jnp.concatenate(
            [exit_none.astype(jnp.float32), want_emit.astype(jnp.float32),
             want_tr.astype(jnp.float32), want_dep.astype(jnp.float32)],
            axis=0)
        return (wrow, pred)

    def body_D2(*args):
        """Conversion phase 2 — LOCAL arbitration: each local DESTINATION
        lane scans its K static predecessors over the gathered want rows
        and latches the winning (minimum-id) source. One [Lgp, K*lp]
        one-hot: O(Lg * l_loc) per device (the round-2 version recomputed
        this globally on every device, an O(Lg^2) term that did not shrink
        with shards)."""
        gI, gW = args[0], args[1]
        cn, gd = _consts(args[2:])
        mn_f = gI[0:1].astype(jnp.float32)
        g_pk = gat_sg([mn_f, gW[0:1], gW[1:2], gW[2:3]],
                      cn["prev_cat"], Lgp, K * lp)
        gid = cn["gid"]
        best = jnp.full((1, lp), Lgp, jnp.int32)
        dep_best = jnp.full((1, lp), Lgp, jnp.int32)
        for k in range(K):
            pk = cn["prev_k"][k: k + 1]
            ok = pk >= 0
            gk = g_pk[:, k * lp:(k + 1) * lp]
            tgt = gk[0:1].astype(jnp.int32)
            c_emit = ok & (gk[1:2] > 0.5) & (tgt == gid)
            c_tr = ok & (gk[2:3].astype(jnp.int32) == gid)
            best = jnp.minimum(best, jnp.where(c_emit | c_tr, pk, Lgp))
            dep_best = jnp.minimum(
                dep_best,
                jnp.where(ok & (gk[3:4].astype(jnp.int32) == gid), pk,
                          Lgp))
        return (best, dep_best)

    def body_D3(*args):
        """Conversion phase 3 — LOCAL wins, removals, inserts, deposits.
        Win verdicts are gathered from the all-gathered verdict rows at
        the local mnext/hnext ([Lgp, 2*lp]); inserts/deposits gather
        source fields from the global post-physics summary at the locally
        arbitrated winner. Event counts are LOCAL partials (psum once per
        episode)."""
        cy = carry_of(args[:N_CARRY])
        (gF, gI, gRoute, gV, pred, best, dep_best, sumI,
         pool_routes) = args[N_CARRY: N_CARRY + 9]
        cn, gd = _consts(args[N_CARRY + 9:])
        r, y = cy["r"], cy["y"]
        pos, vel, av = cy["pos"], cy["vel"], cy["av"]
        count, route, ridx = cy["count"], cy["route"], cy["ridx"]
        cap, cursor = cy["cap"], cy["cursor"]
        lm = cn["lane_mask"] > 0
        gid = cn["gid"]
        fro = lambda i: gF[i: i + 1]
        mn_loc = sumI[0:1]
        hn_loc = sumI[2:3]
        exit_none = (pred[0:1] > 0.5) & lm
        want_emit = (pred[1:2] > 0.5) & lm
        want_tr = (pred[2:3] > 0.5) & lm
        want_dep = (pred[3:4] > 0.5) & lm

        # win verdicts at the local destinations (two gathers: the index
        # rows are sumI slices at different sublane offsets, which cannot
        # share one lane-axis-concatenated gather on Mosaic)
        bwin = gat_sg([gV[0:1].astype(jnp.float32)],
                      jnp.clip(mn_loc, 0, Lgp - 1), Lgp, lp)
        gwin = gat_sg([gV[0:1].astype(jnp.float32),
                       gV[1:2].astype(jnp.float32)],
                      jnp.clip(hn_loc, 0, Lgp - 1), Lgp, lp)
        emit_win = want_emit & (bwin[0:1].astype(jnp.int32) == gid)
        tr_win = want_tr & (gwin[0:1].astype(jnp.int32) == gid)
        dep_win = want_dep & (gwin[1:2].astype(jnp.int32) == gid)
        remove = exit_none | dep_win | tr_win
        has_ins = (best < Lgp) & lm
        src = jnp.where(has_ins, best, -1)
        dep_src = jnp.where((dep_best < Lgp) & lm, dep_best, -1)

        count = count - remove.astype(jnp.int32)
        # capacitor decrement on the winning slot (mnext is local data)
        slot_oh = ((cn["next_k"] == mn_loc) &
                   (cn["next_k"] >= 0)).astype(jnp.float32)
        cap_val = jnp.sum(cap * slot_oh, axis=0, keepdims=True)
        cap_dec = jnp.where(emit_win,
                            jax.lax.stop_gradient(cap_val - veh_len),
                            cap_val)
        cap = cap * (1.0 - slot_oh) + slot_oh * cap_dec
        # ---- inserts (fields gathered from the GLOBAL post summary)
        oh_src = oh(src, Lgp, lp)
        gsg = gat_sg(
            [gd["is_macro_g"], gd["length_g"], gI[1:2].astype(jnp.float32),
             fro(F_AMAX), fro(F_APREF), fro(F_VT), fro(F_MS), fro(F_TP),
             fro(F_HLEN), gRoute.astype(jnp.float32)], src, Lgp, lp,
            prebuilt=oh_src)
        cap_val_g = fro(F_CAP)
        emit_carrier_g = veh_len + cap_val_g - jax.lax.stop_gradient(
            cap_val_g)
        gdf = gat([fro(F_HPOS), fro(F_ULAST), fro(F_HVEL), fro(F_HA),
                   emit_carrier_g], src, Lgp, lp, prebuilt=oh_src)
        src_is_macro = gsg[0:1] > 0.5
        is_emit_d = has_ins & src_is_macro
        new_pos_d = jnp.where(is_emit_d, 0.0, gdf[0:1] - gsg[1:2])
        new_vel_d = jnp.where(is_emit_d, gdf[1:2], gdf[2:3])
        new_a_d = jnp.where(is_emit_d, gdf[4:5], gdf[3:4])
        newp = {}
        for i, nm in enumerate(("accel_max", "accel_pref", "target_speed",
                                "min_space", "time_pref")):
            newp[nm] = jnp.where(is_emit_d, dflt[nm], gsg[3 + i: 4 + i])
        newp["length"] = jnp.where(is_emit_d, dflt["length"], gsg[8:9])
        ohc = ((jax.lax.broadcasted_iota(jnp.int32, (P_emit, 1, lp), 0) ==
                (cursor % P_emit)[None]).astype(jnp.float32))
        pool_route = jnp.sum(pool_routes.astype(jnp.float32) * ohc, axis=0)
        new_route_d = jnp.where(is_emit_d, pool_route, gsg[9:]).astype(
            jnp.int32)
        new_ridx_d = jnp.where(
            is_emit_d, 0, gsg[2:3].astype(jnp.int32) + 1).astype(jnp.int32)

        hm = has_ins
        pos = tail_insert(pos, new_pos_d[0], hm)
        vel = tail_insert(vel, new_vel_d[0], hm)
        av = tail_insert(av, new_a_d[0], hm)
        p_amax = tail_insert(cy["p_amax"], newp["accel_max"][0], hm)
        p_apref = tail_insert(cy["p_apref"], newp["accel_pref"][0], hm)
        p_vt = tail_insert(cy["p_vt"], newp["target_speed"][0], hm)
        p_ms = tail_insert(cy["p_ms"], newp["min_space"][0], hm)
        p_tp = tail_insert(cy["p_tp"], newp["time_pref"][0], hm)
        p_len = tail_insert(cy["p_len"], newp["length"][0], hm)
        route = jnp.where(hm[None], jnp.concatenate(
            [new_route_d[None], route[:-1]], axis=0), route)
        ridx = tail_insert(ridx, new_ridx_d[0], hm)
        count = count + hm.astype(jnp.int32)
        cursor = cursor + is_emit_d.astype(jnp.int32)

        # ---- deposits (gather at the CLIPPED index: a -1 gather yields
        # zeros and the add_r division would produce NaN under the masked
        # branch's zero cotangent — the round-1 dead-branch lesson)
        dep_has = dep_src >= 0
        gdep = gat([fro(F_HPOS), gd["length_g"], fro(F_HLEN), fro(F_HA),
                    fro(F_HVEL)], jnp.clip(dep_src, 0, Lgp - 1), Lgp, lp)
        v_head = gdep[0:1] - gdep[1:2]
        v_tail = v_head - gdep[2:3]
        cells = jax.lax.broadcasted_iota(jnp.int32, (Cp, lp), 0).astype(
            jnp.float32)
        c_tail = cells * cn["cell_len"]
        c_head = (cells + 1.0) * cn["cell_len"]
        ov = ((c_head > v_tail) & (c_tail < v_head) & (cn["cmask"] > 0) &
              dep_has & (cn["cell_len"] > v_tail))
        max_head = jnp.maximum(c_head, v_head)
        min_tail = jnp.minimum(c_tail, v_tail)
        overlap = cn["cell_len"] + gdep[2:3] - (max_head - min_tail)
        add_r = (gdep[3:4] / jax.lax.stop_gradient(gdep[2:3]) *
                 (overlap / cn["cell_len"]))
        n_r = r + add_r
        n_r = n_r - jax.lax.stop_gradient(n_r - jnp.clip(n_r, 1e-5,
                                                         1.0 - 1e-5))
        r = jnp.where(ov, n_r, r)
        y = jnp.where(ov, arz.compute_y(n_r, gdep[4:5], u_max), y)

        # ---- is-static RMS partials (post-conversion)
        u_cells = arz.compute_u(r, y, u_max)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Vp, lp), 0)
        veh_m = ((rows < count) & (cn["is_macro"] < 0.5) &
                 lm).astype(jnp.float32)
        ss_part = jax.lax.stop_gradient(jnp.concatenate(
            [(jnp.sum((static_speed - u_cells) * cn["cmask"]) +
              jnp.sum((static_speed - vel) * veh_m)).reshape(1, 1),
             (jnp.sum(cn["cmask"]) + jnp.sum(veh_m)).reshape(1, 1)],
            axis=1))
        # LOCAL event partials (psum'd ONCE per episode by the caller)
        evf = lambda m: jnp.sum(m.astype(jnp.float32))
        ev = jax.lax.stop_gradient(jnp.concatenate(
            [evf(is_emit_d).reshape(1, 1),
             evf(exit_none | dep_win).reshape(1, 1),
             evf(tr_win).reshape(1, 1)], axis=1))

        return (r, y, pos, vel, av, p_amax, p_apref, p_vt, p_ms, p_tp,
                p_len, count, route, ridx, cap, cursor, ss_part, ev)


    def body_D_all(*args):
        """Single-device conversion: phases 1-3 fused in ONE kernel (the
        all_gathers between them are identities when the mesh has one lane
        shard, so no collective and no extra launches are needed)."""
        comps = args[:N_CARRY]
        sumF, sumI, route_h, pool_routes = args[N_CARRY: N_CARRY + 4]
        consts = args[N_CARRY + 4:]
        wrow, pred = body_D1(*comps, sumF, sumI, sumF, sumI, *consts)
        best, dep_best = body_D2(sumI, wrow, *consts)
        gV = jnp.concatenate([best, dep_best], axis=0)
        return body_D3(*comps, sumF, sumI, route_h, gV, pred, best,
                       dep_best, sumI, pool_routes, *consts)

    def body_ABC(*args):
        """Single-device composition of phases A+B+C in ONE kernel: the
        pre-physics all_gather is an identity when the lane axis has one
        shard (lp == Lgp), and the signal-RMS psum is a local add, so the
        sigmoid constant is computed inline. Returns C's outputs plus the
        B-side carry components, the injection count, and the updated
        signal-RMS accumulator."""
        comps = args[:N_CARRY]
        (rand_t, sched_t, action2d, t2d, mnext_t, mprev_t, inj_routes,
         sg_ms) = args[N_CARRY: N_CARRY + 8]
        consts = args[N_CARRY + 8:]
        (sumA,) = body_A(*comps, rand_t, sched_t, *consts)
        outB = body_B(*comps, sumA, action2d, t2d, mnext_t, mprev_t,
                      sched_t, inj_routes, *consts)
        (pos, vel, av, p_amax, p_apref, p_vt, p_ms, p_tp, p_len, count,
         route, ridx, inj_left, bl_r, bl_u, gr_r, gr_u, sig, pd_g, sd_g,
         red_pd, fsig, blend_f, n_inj, sg_part) = outB
        comps2 = (comps[0], comps[1], pos, vel, av, p_amax, p_apref, p_vt,
                  p_ms, p_tp, p_len, count, route, ridx, comps[14],
                  inj_left, comps[16])
        sg_ms2 = sg_ms + sg_part
        if diff:
            c_sig = (32.0 * gsc / jnp.maximum(jnp.abs(mean_of(sg_ms2)),
                                        1e-6)).reshape(1, 1)
        else:
            c_sig = jnp.ones((1, 1))
        outC = body_C(*comps2, bl_r, bl_u, gr_r, gr_u, sig, pd_g, sd_g,
                      red_pd, fsig, blend_f, c_sig, mnext_t, *consts)
        (r, y, pos, vel, cap, max_wave, sumF, sumI, route_h) = outC
        return (r, y, pos, vel, cap, max_wave, sumF, sumI, route_h, av,
                p_amax, p_apref, p_vt, p_ms, p_tp, p_len, count, route,
                ridx, inj_left, n_inj, sg_ms2)

    def body_DE(*args):
        """Single-device composition of the conversion (phases 1-3) and
        the queue readout in ONE kernel, the static-RMS psum inlined."""
        comps = args[:N_CARRY]
        sumF, sumI, route_h, pool_routes, ss_ms = args[
            N_CARRY: N_CARRY + 5]
        consts = args[N_CARRY + 5:]
        outD = body_D_all(*comps, sumF, sumI, route_h, pool_routes,
                          *consts)
        ss_part, ev = outD[16], outD[17]
        ss_ms2 = ss_ms + ss_part
        c_st = (16.0 / jnp.maximum(jnp.abs(mean_of(ss_ms2)),
                                   1e-6)).reshape(1, 1)
        newcomps = outD[:15] + (comps[15], outD[15])
        (queue,) = body_E(*newcomps, c_st, *consts)
        return outD[:16] + (queue, ev, ss_ms2)

    def body_STEP(*args):
        """Single-device WHOLE step in ONE kernel (A+B+C+conversion+E):
        on a 1-shard lane axis every collective is an identity, so one
        launch (plus its backward) carries the entire simulation step."""
        comps = args[:N_CARRY]
        (rand_t, sched_t, action2d, t2d, mnext_t, mprev_t, inj_routes,
         pool_routes, sg_ms, ss_ms) = args[N_CARRY: N_CARRY + 10]
        consts = args[N_CARRY + 10:]
        outABC = body_ABC(*comps, rand_t, sched_t, action2d, t2d, mnext_t,
                          mprev_t, inj_routes, sg_ms, *consts)
        (r, y, pos, vel, cap, max_wave, sumF, sumI, route_h, av, p_amax,
         p_apref, p_vt, p_ms, p_tp, p_len, count, route, ridx, inj_left,
         n_inj, sg_ms2) = outABC
        comps2 = (r, y, pos, vel, av, p_amax, p_apref, p_vt, p_ms, p_tp,
                  p_len, count, route, ridx, cap, inj_left, comps[16])
        outDE = body_DE(*comps2, sumF, sumI, route_h, pool_routes, ss_ms,
                        *consts)
        newcomps = outDE[:15] + (inj_left, outDE[15])
        queue, ev, ss_ms2 = outDE[16], outDE[17], outDE[18]
        return newcomps + (queue, ev, n_inj, max_wave, sg_ms2, ss_ms2)

    def body_E(*args):
        cy = carry_of(args[:N_CARRY])
        c_st = args[N_CARRY]
        cn, gd = _consts(args[N_CARRY + 1:])
        u_cells = arz.compute_u(cy["r"], cy["y"], u_max)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Vp, lp), 0)
        veh_m = ((rows < cy["count"]) & (cn["is_macro"] < 0.5) &
                 (cn["lane_mask"] > 0)).astype(jnp.float32)
        if diff:
            stat_c = soft(static_speed - u_cells, c_st[0, 0])
            stat_v = soft(static_speed - cy["vel"], c_st[0, 0])
        else:
            stat_c = (u_cells < static_speed).astype(jnp.float32)
            stat_v = (cy["vel"] < static_speed).astype(jnp.float32)
        q_macro = jnp.sum(stat_c * (cy["r"] * cn["cell_len"] / veh_len) *
                          cn["cmask"], axis=0, keepdims=True)
        q_micro = jnp.sum(stat_v * veh_m, axis=0, keepdims=True)
        q_lane = jnp.where(cn["is_macro"] > 0, q_macro, q_micro)
        return ((jnp.sum(q_lane * q_lane) * dt).reshape(1, 1),)

    # ======================================================================
    # assemble: dkernels + shard_map scan
    # ======================================================================
    def zf(*s):
        return jnp.zeros(s, jnp.float32)

    def zi(*s):
        return jnp.zeros(s, jnp.int32)

    ex_lc = ([jnp.asarray(v[0]) for v in (lc[k] for k in lc_names)] +
             [G[k] for k in g_names])
    ex_carry = (zf(Cp, lp), zf(Cp, lp), zf(Vp, lp), zf(Vp, lp), zf(Vp, lp),
                zf(Vp, lp), zf(Vp, lp), zf(Vp, lp), zf(Vp, lp), zf(Vp, lp),
                zf(Vp, lp), zi(1, lp), zi(Vp, R, lp), zi(Vp, lp),
                zf(K, lp), zi(1, lp), zi(1, lp))
    ex_A = ex_carry + (zf(1, lp), zf(1, lp)) + tuple(ex_lc)
    kA = make_dkernel(body_A, ex_A, CARRY_DIFF, interpret=interpret,
                      name="spatialA")
    ex_B = ex_carry + (zf(9, Lgp), zf(NPp, NIp), zi(1, 1), zi(1, lp),
                       zi(1, lp), zf(1, lp),
                       zi(P_inj, R, lp)) + tuple(ex_lc)
    diff_B = CARRY_DIFF + (N_CARRY, N_CARRY + 1)  # + gA, action2d
    kB = make_dkernel(body_B, ex_B, diff_B, interpret=interpret,
                      name="spatialB")
    ex_C = ex_carry + (zf(1, lp),) * 10 + (zf(1, 1), zi(1, lp)) + \
        tuple(ex_lc)
    diff_C = CARRY_DIFF + tuple(range(N_CARRY, N_CARRY + 10)) + \
        (N_CARRY + 10,)
    kC = make_dkernel(body_C, ex_C, diff_C, interpret=interpret,
                      name="spatialC")
    if n_shard > 1:
        # owner-computes conversion: D1 (local wants) and D2 (local
        # arbitration) are wholly discrete -> plain stop-gradient kernels
        # (no backward launches); D3 carries the differentiable
        # insert/deposit gathers
        ex_D1 = ex_carry + (zf(15, lp), zi(3, lp), zf(15, Lgp),
                            zi(3, Lgp)) + tuple(ex_lc)
        kD1 = make_kernel_sg(body_D1, ex_D1, interpret=interpret,
                             name="spatialD1")
        ex_D2 = (zi(3, Lgp), zf(3, Lgp)) + tuple(ex_lc)
        kD2 = make_kernel_sg(body_D2, ex_D2, interpret=interpret,
                             name="spatialD2")
        ex_D3 = ex_carry + (zf(15, Lgp), zi(3, Lgp), zi(R, Lgp),
                            zi(2, Lgp), zf(4, lp), zi(1, lp), zi(1, lp),
                            zi(3, lp), zi(P_emit, R, lp)) + tuple(ex_lc)
        diff_D3 = CARRY_DIFF + (N_CARRY,)  # + gF
        kD3 = make_dkernel(body_D3, ex_D3, diff_D3, interpret=interpret,
                           name="spatialD3")
        conv_kernels = dict(D1=(body_D1, ex_D1), D2=(body_D2, ex_D2),
                            D3=(body_D3, ex_D3))
        ex_E = ex_carry + (zf(1, 1),) + tuple(ex_lc)
        diff_E = CARRY_DIFF + (N_CARRY,)
        kE = make_dkernel(body_E, ex_E, diff_E, interpret=interpret,
                          name="spatialE")
    else:
        # single lane shard: the inter-phase collectives are identities,
        # so the WHOLE step fuses into two kernels (A+B+C and D1+D2+D3+E)
        # — 2 launches/step instead of 5 kernels + 3 collectives
        ex_STEP = ex_carry + (zf(1, lp), zf(1, lp), zf(NPp, NIp),
                              zi(1, 1), zi(1, lp), zi(1, lp),
                              zi(P_inj, R, lp), zi(P_emit, R, lp),
                              zf(1, 2), zf(1, 2)) + tuple(ex_lc)
        diff_STEP = CARRY_DIFF + (N_CARRY + 2,)  # + action2d
        kSTEP = make_dkernel(body_STEP, ex_STEP, diff_STEP,
                             interpret=interpret, name="spatialSTEP")
        conv_kernels = dict(STEP=(body_STEP, ex_STEP))

    def local_episode(lc_loc, inj_loc, pool_loc, action2d, sched, mnextx,
                      mprevx, rand):
        """Runs on one device inside shard_map; per-step inputs are the
        local [T, 1, lp] blocks."""
        lc_vals = tuple(lc_loc[k][0] for k in lc_names) + tuple(
            G[k] for k in g_names)
        inj_routes = inj_loc[0]
        pool_routes = pool_loc[0]
        inj_left0 = jnp.where(
            (lc_loc["has_prev"][0] == 0) & (lc_loc["is_macro"][0] < 0.5) &
            (lc_loc["lane_mask"][0] > 0), P_inj, 0).astype(jnp.int32)
        carry0 = (zf(Cp, lp), zf(Cp, lp), zf(Vp, lp), zf(Vp, lp),
                  zf(Vp, lp),
                  jnp.full((Vp, lp), dflt["accel_max"]),
                  jnp.full((Vp, lp), dflt["accel_pref"]),
                  jnp.full((Vp, lp), dflt["target_speed"]),
                  jnp.full((Vp, lp), dflt["min_space"]),
                  jnp.full((Vp, lp), dflt["time_pref"]),
                  jnp.full((Vp, lp), dflt["length"]),
                  zi(1, lp), jnp.full((Vp, R, lp), -1, jnp.int32),
                  zi(Vp, lp), zf(K, lp), inj_left0, zi(1, lp))

        def pad_cols(x, fill):
            if Lgp == L:
                return x
            return jnp.concatenate(
                [x, jnp.full((x.shape[0], Lgp - L), fill, x.dtype)],
                axis=1)

        def ag(x, fill):
            return pad_cols(lax.all_gather(x[:, :l_loc], axis_name,
                                           axis=1, tiled=True), fill)

        def step_sharded(carry, inputs):
            comps, sg_ms, ss_ms = carry
            t, sched_t, mnext_t, mprev_t, rand_t = inputs
            t2d = t.reshape(1, 1).astype(jnp.int32)
            (sumA,) = kA(*comps, rand_t, sched_t, *lc_vals)
            gA = ag(sumA, 0.0)
            outB = kB(*comps, gA, action2d, t2d, mnext_t, mprev_t, sched_t,
                      inj_routes, *lc_vals)
            (pos, vel, av, p_amax, p_apref, p_vt, p_ms, p_tp, p_len,
             count, route, ridx, inj_left, bl_r, bl_u, gr_r, gr_u, sig,
             pd_g, sd_g, red_pd, fsig, blend_f, n_inj, sg_part) = outB
            comps = (comps[0], comps[1], pos, vel, av, p_amax, p_apref,
                     p_vt, p_ms, p_tp, p_len, count, route, ridx,
                     comps[14], inj_left, comps[16])
            if diff:
                sg_ms = sg_ms + lax.psum(sg_part, axis_name)
                c_sig = (32.0 * gsc / jnp.maximum(jnp.abs(mean_of(sg_ms)),
                                            1e-6)).reshape(1, 1)
            else:
                c_sig = jnp.ones((1, 1))
            (r, y, pos, vel, cap, max_wave, sumF, sumI, route_h) = kC(
                *comps, bl_r, bl_u, gr_r, gr_u, sig, pd_g, sd_g, red_pd,
                fsig, blend_f, c_sig, mnext_t, *lc_vals)
            comps = (r, y, pos, vel) + comps[4:14] + (cap,) + comps[15:]
            gF = ag(sumF, 0.0)
            # int streams carry no cotangent; stop_gradient prunes the
            # float0 transpose paths AD would otherwise trip over
            gI = ag(lax.stop_gradient(sumI), -1)
            gR = ag(lax.stop_gradient(route_h), -1)
            (wrow, pred) = kD1(*comps, lax.stop_gradient(sumF), sumI, gF,
                               gI, *lc_vals)
            gW = ag(wrow, -2.0)
            (best, dep_best) = kD2(gI, gW, *lc_vals)
            gV = ag(jnp.concatenate([best, dep_best], axis=0), Lgp)
            outD = kD3(*comps, gF, gI, gR, gV, pred, best, dep_best,
                       sumI, pool_routes, *lc_vals)
            (r, y, pos, vel, av, p_amax, p_apref, p_vt, p_ms, p_tp, p_len,
             count, route, ridx, cap, cursor, ss_part, ev) = outD
            comps = (r, y, pos, vel, av, p_amax, p_apref, p_vt, p_ms, p_tp,
                     p_len, count, route, ridx, cap, comps[15], cursor)
            ss_ms = ss_ms + lax.psum(ss_part, axis_name)
            c_st = (16.0 / jnp.maximum(jnp.abs(mean_of(ss_ms)),
                                       1e-6)).reshape(1, 1)
            (queue_loc,) = kE(*comps, c_st, *lc_vals)
            return ((comps, sg_ms, ss_ms),
                    (queue_loc[0, 0],
                     jax.lax.stop_gradient(n_inj)[0, 0], ev[0, 0],
                     ev[0, 1], lax.stop_gradient(max_wave[0, 0])))

        def step_single(carry, inputs):
            # n_shard == 1: the WHOLE step is one fused kernel launch
            comps, sg_ms, ss_ms = carry
            t, sched_t, mnext_t, mprev_t, rand_t = inputs
            t2d = t.reshape(1, 1).astype(jnp.int32)
            out = kSTEP(*comps, rand_t, sched_t, action2d, t2d, mnext_t,
                        mprev_t, inj_routes, pool_routes, sg_ms, ss_ms,
                        *lc_vals)
            comps = out[:N_CARRY]
            queue_loc, ev, n_inj, max_wave, sg_ms, ss_ms = out[N_CARRY:]
            return ((comps, sg_ms, ss_ms),
                    (queue_loc[0, 0],
                     jax.lax.stop_gradient(n_inj)[0, 0], ev[0, 0],
                     ev[0, 1], lax.stop_gradient(max_wave[0, 0])))

        step = step_single if n_shard == 1 else step_sharded
        if config.get("remat", True):
            step = jax.checkpoint(step)
        (_, _, _), ys = lax.scan(
            step, (carry0, jnp.zeros((1, 2)), jnp.zeros((1, 2))),
            (jnp.arange(T), sched[:, 0], mnextx[:, 0], mprevx[:, 0],
             rand[:, 0]))
        queues_loc, n_injs_loc, emits_loc, absorbs_loc, mws_loc = ys
        # event counts / injections / CFL maxima are LOCAL partials,
        # reduced ONCE per episode (the per-step psum/pmax of round 2 cost
        # 2 extra collectives every step)
        queues = lax.psum(queues_loc, axis_name)
        n_injs = lax.psum(n_injs_loc, axis_name)
        emits = lax.psum(emits_loc, axis_name)
        absorbs = lax.psum(absorbs_loc, axis_name)
        mws = lax.pmax(mws_loc, axis_name)
        return queues, n_injs, emits, absorbs, mws

    # ---- host-side data prep + shard_map wrapper ---------------------------
    def to_blocks(x, fill):
        """[T, L] -> [T, n_shard, 1, lp] (shard axis explicit)."""
        x = jnp.asarray(x)
        out = jnp.full((T, n_shard, 1, lp), fill, x.dtype)
        return out.at[:, :, 0, :l_loc].set(x.reshape(T, n_shard, l_loc))

    lc_dev = {k: jnp.asarray(v) for k, v in lc.items()}
    inj_dev = jnp.asarray(inj_l)
    pool_dev = jnp.asarray(pool_l)
    shard0 = P(axis_name)
    blocks = P(None, axis_name)

    sharded = jax.shard_map(
        local_episode, mesh=mesh,
        in_specs=({k: shard0 for k in lc_dev}, shard0, shard0, P(),
                  blocks, blocks, blocks, blocks),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False)

    @jax.jit
    def run(action_flat, key, sched, mnextx, mprevx):
        action_p = jnp.zeros((NPp, NIp)).at[:n_phases, :n_inter].set(
            jnp.asarray(action_flat).reshape(n_phases, n_inter))
        rand = jax.random.uniform(key, (T, L))
        queues, n_injs, emits, absorbs, mws = sharded(
            lc_dev, inj_dev, pool_dev, action_p, to_blocks(sched, 0.0),
            to_blocks(mnextx, -1), to_blocks(mprevx, -1),
            to_blocks(rand, 2.0))
        return EpisodeResult(
            reward=-jnp.sum(queues), queue_per_step=queues,
            emitted=jnp.sum(emits).astype(jnp.int32),
            absorbed=jnp.sum(absorbs).astype(jnp.int32),
            injected=jnp.sum(n_injs).astype(jnp.int32),
            max_wave_speed=jnp.max(mws),
            events_per_step=jnp.stack(
                [n_injs, emits, absorbs], axis=1).astype(jnp.int32))

    def episode(action_flat, key):
        return run(action_flat, key, env.data.schedule,
                   env.data.mroute_next, env.data.mroute_prev)

    episode.geometry = dict(L=L, l_loc=l_loc, lp=lp, Lgp=Lgp, T=T, W=win,
                            n_shard=n_shard)
    # conversion-phase bodies + example args, for per-device cost
    # analysis (tests assert the FLOP count shrinks with the shard count)
    episode._conv_kernels = conv_kernels
    # the WRAPPED per-shard Pallas ops + example args, for standalone
    # Mosaic compiles (per-shard VMEM evidence at shard counts the
    # single real chip cannot host as a mesh — bench/spatial_shard_vmem.py)
    if n_shard > 1:
        episode._shard_kernels = dict(
            A=(kA, ex_A), B=(kB, ex_B), C=(kC, ex_C), D1=(kD1, ex_D1),
            D2=(kD2, ex_D2), D3=(kD3, ex_D3), E=(kE, ex_E))
    else:
        episode._shard_kernels = dict(STEP=(kSTEP, ex_STEP))
    from types import SimpleNamespace

    # internals for the 2-D (data, lane) train-step composition
    episode._parts = SimpleNamespace(
        local_episode=local_episode, lc_dev=lc_dev, inj_dev=inj_dev,
        pool_dev=pool_dev, to_blocks=to_blocks, L=L, T=T, lp=lp,
        l_loc=l_loc, n_phases=n_phases, n_inter=n_inter, NPp=NPp, NIp=NIp,
        axis_name=axis_name)
    return episode


def make_fused_spatial_train_step(env, model, optimizer, mesh: Mesh, obs,
                                  low, high, axis_name: str = "lane"):
    """Controller training step over the sharded-FUSED episode: the scene
    sharded over ``axis_name``, an episode batch vmapped on top (the batch
    lifts into the step kernels' grid), replicated controller params, one
    jitted loss/grad/Adam update. The per-episode loss matches
    ``-env.episode(squash(model(obs)), True, key).reward`` to the module's
    parity tolerance.

    Returns ``fn(params, opt_state, keys[B]) -> (params, opt_state,
    loss)``. Single-mesh-axis composition (the 2-D ``(data, lane)``
    variant remains the scan-based
    :func:`dhts.apps.control.itscp.spatial.make_spatial_train_step`)."""
    import optax

    from dhts.apps.control.controller import squash_action

    ep = make_fused_spatial_episode(env, mesh, differentiable=True,
                                    axis_name=axis_name)
    obs = jnp.asarray(obs)

    def loss_fn(params, keys):
        raw = model.apply(params, obs)
        action = squash_action(raw, low, high)
        return -jnp.mean(jax.vmap(lambda k: ep(action, k).reward)(keys))

    @jax.jit
    def train_step(params, opt_state, keys):
        loss, grads = jax.value_and_grad(loss_fn)(params, keys)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def make_fused_spatial_train_step_2d(env, model, optimizer, mesh: Mesh,
                                     obs, low, high,
                                     axis_data: str = "data",
                                     axis_lane: str = "lane"):
    """The FULL production composition on a 2-D ``(data, lane)`` mesh with
    the per-shard kernel episode: the episode batch sharded over
    ``axis_data``, every episode's SCENE sharded over ``axis_lane``,
    replicated controller, one psum'd loss/gradient — the fused
    counterpart of
    :func:`dhts.apps.control.itscp.spatial.make_spatial_train_step`.

    One ``shard_map`` over both axes: each (data, lane) device cell runs
    its local keys' episodes (vmapped — the batch lifts into the kernels'
    grid) with collectives over ``axis_lane`` only, then the loss means
    over ``axis_data`` and pmeans over ``axis_lane`` (identity forward,
    gradient-scaling transpose, like the scan version).

    Returns ``fn(params, opt_state, keys[B]) -> (params, opt_state,
    loss)``; B must divide the data-axis size."""
    import optax

    from dhts.apps.control.controller import squash_action

    assert axis_data in mesh.axis_names and axis_lane in mesh.axis_names
    ep = make_fused_spatial_episode(env, mesh, differentiable=True,
                                    axis_name=axis_lane)
    p = ep._parts
    obs = jnp.asarray(obs)
    sched_b = p.to_blocks(env.data.schedule, 0.0)
    mnext_b = p.to_blocks(env.data.mroute_next, -1)
    mprev_b = p.to_blocks(env.data.mroute_prev, -1)

    def local_loss(lc_loc, inj_loc, pool_loc, sched, mn, mp, params,
                   keys_local):
        raw = model.apply(params, obs)
        action = squash_action(raw, low, high)
        action_p = jnp.zeros((p.NPp, p.NIp)).at[
            :p.n_phases, :p.n_inter].set(
                action.reshape(p.n_phases, p.n_inter))
        off = lax.axis_index(axis_lane) * p.l_loc

        def ep_loss(key):
            # the same global draw as the unsharded episode, local columns
            rand = jax.random.uniform(key, (p.T, p.L))
            rand_l = jnp.full((p.T, 1, p.lp), 2.0).at[:, 0, :p.l_loc].set(
                lax.dynamic_slice_in_dim(rand, off, p.l_loc, 1))
            queues, *_ = p.local_episode(lc_loc, inj_loc, pool_loc,
                                         action_p, sched, mn, mp, rand_l)
            return jnp.sum(queues)  # loss = -reward

        loss_loc = jnp.mean(jax.vmap(ep_loss)(keys_local))
        return lax.pmean(lax.pmean(loss_loc, axis_data), axis_lane)

    shard_l = P(axis_lane)
    blocks = P(None, axis_lane)
    loss_fn = jax.shard_map(
        local_loss, mesh=mesh,
        in_specs=({k: shard_l for k in p.lc_dev}, shard_l, shard_l,
                  blocks, blocks, blocks, P(), P(axis_data)),
        out_specs=P(), check_vma=False)

    @jax.jit
    def train_step(params, opt_state, keys):
        loss, grads = jax.value_and_grad(
            lambda q: loss_fn(p.lc_dev, p.inj_dev, p.pool_dev, sched_b,
                              mnext_b, mprev_b, q, keys))(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step
