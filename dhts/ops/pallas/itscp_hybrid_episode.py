"""Whole-episode fused Pallas kernel for ITSCP hybrid/micro scenes, fwd+bwd.

Generalizes :mod:`dhts.ops.pallas.itscp_episode` to scenes with micro lanes:
the vehicle containers live in VMEM as ``[V, Lp]`` rows (slot v behind slot
v+1; fixed capacity), routes as ``[V, R, Lp]``, and every per-step event of
the scan-based env — stochastic waiting-pool injection, route-window leader
search, IDM, signal-blended deltas, flux-capacitor emission, micro↔micro
transfer, micro→macro mass deposits, exits — is expressed with the same
one-hot-matmul gather idiom (dynamic vector gathers do not lower on Pallas
TPU).

The full per-step carry (~0.7 MB on the flagship scene, dominated by the
``[V, R, Lp]`` route container) is far too big to keep T copies of in VMEM,
so unlike the macro kernel this one is **grid-streamed**: the forward runs
with ``grid=(T,)``, carries simulation state across grid steps in VMEM
scratch, and emits each step's carry as an HBM-streamed residual block; the
backward runs the grid in reverse, streams each step's carry back in, and
applies one in-kernel ``jax.vjp`` of the step per grid iteration with the
float cotangents (state grads) held in scratch and the action gradient
accumulated in a revisited output block. Residual HBM traffic is a few
hundred MB per episode — microseconds at HBM bandwidth — while launch count
drops from ~100 XLA ops x T to 2 kernels.

Step semantics mirror ``dhts/apps/control/itscp/env.py::boundary_and_step``
exactly (same formulas, same RMS statistics, same arbitration); the parity
tests drive both on identical pre-drawn randomness and compare action
gradients.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dhts.ops import arz, idm
from dhts.ops.pallas import _compat  # noqa: F401  (reduce_precision lowering)

_LANE = 128
_SUBLANE = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


def leader_window(is_macro, routes) -> int:
    """Tight leader-search window for :func:`make_fused_itscp_episode`.

    The route-window walk terminates as soon as it hits a macro lane, the
    route end, or an occupied micro lane, so it only ever needs to look
    ``max consecutive micro-lane run + 1`` entries ahead — on ITSCP grids
    that is ~4, not MAX_ROUTE_LENGTH-1 = 31. ``routes``: any int array whose
    last axis is route entries (lane ids, -1 padded)."""
    is_macro = np.asarray(is_macro).astype(bool)
    entries = np.asarray(routes).reshape(-1, np.asarray(routes).shape[-1])
    micro = np.zeros(entries.shape, bool)
    valid = entries >= 0
    micro[valid] = ~is_macro[entries[valid]]
    if micro.size == 0:
        return 1
    # max consecutive-True run per row, vectorized: the running count is
    # cumsum minus the cumsum value latched at the most recent False
    c = np.cumsum(micro, axis=1)
    latched = np.maximum.accumulate(np.where(micro, 0, c), axis=1)
    return int((c - latched).max()) + 1


def make_fused_itscp_episode(spec, meta, config, V: int, R: int, P: int,
                             P_emit: int, differentiable: bool = False, *,
                             window: int | None = None,
                             interpret: bool | None = None,
                             episodes: int = 1, ep_of_lane=None,
                             wide_ops: bool | None = None,
                             _ablate: tuple = ()):
    """Build the fused differentiable episode for a (possibly) hybrid scene.

    Returns ``fn(action2d, schedule[T,L], mnext[T,L], mprev[T,L],
    rand[T,L], inj_routes[L,P,R], emit_routes[L,P_emit,R]) ->
    (reward, queues[T])`` starting from the empty network state (the ITSCP
    initial condition). Differentiable w.r.t. ``action2d`` (custom VJP; the
    other inputs are event data). ``inj_routes`` is the boundary injection
    waiting pool (env ``data.inj_routes``); ``emit_routes`` the emission
    route pool popped by macro->micro conversion (``state.route_pool`` —
    these are distinct pools in the scan model).

    ``window``: static bound on the leader-search route window. Must be at
    least ``leader_window(spec.is_macro, <all route pools>)`` — i.e. large
    enough that the walk always terminates inside it; defaults to the safe
    R-1.

    ``wide_ops``: run the walk-latch fold and the K-way arbitration scan
    as single wide-row passes over the already-wide hop/predecessor
    gather blocks (value-identical; see ``walk_latch_wide``). Default is
    the ``DHTS_WIDE_OPS`` env var (off until Mosaic-verified on real
    TPU hardware).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    L = int(spec.num_lanes)
    C = int(spec.max_cells)
    # DHTS_LP_ALIGN: round the padded lane count up to a coarser multiple
    # than 128 so the banded chunk width (which must divide Lp and stay
    # 128-aligned for Mosaic lane slices) has more choices. 9x9 is the
    # motivating case: L=1296 -> Lp=1408=11x128 admits only chunk 128;
    # align 512 gives Lp=1536=12x128 and unlocks chunks 256/384/512 for
    # ~9% extra elementwise rows. Padding lanes are inert (masked
    # geometry, -1 index rows), so any multiple of 128 is value-safe.
    import os as _os
    _lp_align = int(_os.environ.get("DHTS_LP_ALIGN", "0"))
    if _lp_align:
        # a non-128-multiple alignment would make n_chunks = Lp // chunk_c
        # floor and leave tail columns holding REAL lanes uncovered by the
        # banded chunk starts — round it up to a lane multiple instead
        _lp_align = _round_up(_lp_align, _LANE)
    Lp = _round_up(L, max(_LANE, _lp_align))
    Cp = _round_up(C, _SUBLANE)
    Vp = _round_up(V, _SUBLANE)
    T = int(config["policy_length"] * config["duration"] *
            config["simulation_frequency"])
    nsf = config["simulation_frequency"] * config["signal_length"]
    n_phases = max(1, (config["policy_length"] * config["duration"]) //
                   config["signal_length"])
    n_inter = int(config["num_intersection"]) ** 2
    if episodes > 1:
        # per-episode action blocks laid side by side in the action row
        # (episode b's intersection i is action column b * n_inter + i,
        # matching the packed meta.inter offsets)
        n_inter *= int(episodes)
    NIp = _round_up(n_inter, _LANE)
    NPp = _round_up(n_phases, _SUBLANE)
    dt = 1.0 / config["simulation_frequency"]
    # soft signal-gate sharpness multiplier (1.0 = reference parity; see
    # DEFAULT_CONFIG soft_gate_scale) — hard gates are unaffected
    gsc = float(config.get("soft_gate_scale", 1.0))
    # gate_mode "st": straight-through gates — FORWARD values are the hard
    # thresholds (so the training loss is the hard eval metric, closing
    # the soft/hard surrogate gap 5x5 training exploits), gradients flow
    # through the soft sigmoids. "soft" (default) = reference parity.
    st_mode = str(config.get("gate_mode", "soft")) == "st"
    u_max = float(config["speed_limit"])
    static_speed = float(config["static_speed"])
    veh_len = float(config["vehicle_length"])
    diff = differentiable
    W = R - 1 if window is None else max(1, min(int(window), R - 1))
    K = int(np.asarray(spec.next_lanes).shape[1])

    # ---- banded gathers (large scenes) ------------------------------------
    # Every boundary/conversion index row is ADJACENCY-class: its target
    # lies within the scene's static adjacency bandwidth of the column
    # lane (the ITSCP grid numbering is band-limited, band = 16N+7; route
    # successors are adjacency edges, so hnext/prev_l/next_l inherit the
    # bound, and arbitration winners are predecessors of the column). At
    # Lp >= 512 the [Lp, M*Lp] one-hot dots dominate the step, so those
    # gathers run as chunked block-band dots instead: per 128-column
    # chunk, a [wt*128, M*128] window one-hot — total dot area
    # M*wt*128*Lp instead of M*Lp^2 (2.3x less at 7x7, 3.7x at 9x9 for
    # wt=3/5). Bit-exact: in-band indices hit the same one-hot column;
    # out-of-band only ever occurs for sentinel-clipped no-win indices
    # whose gathered zeros feed where-masked branches (same masking the
    # dense path relies on for padding-lane gathers). The WALK's hop
    # targets are o hops down a route (unbounded) and stay dense.
    _nl = np.asarray(spec.next_lanes)
    _pl = np.asarray(spec.prev_lanes)
    _ids = np.arange(L)[:, None]
    band = 0
    for _adj in (_nl, _pl):
        if _adj.size:
            band = max(band, int(np.abs(
                np.where(_adj >= 0, _adj - _ids, 0)).max()))
    _pad = _LANE * int(np.ceil(band / _LANE)) if band else _LANE
    # chunk width trades one-hot area (window = chunk + 2*pad) against
    # per-chunk dot count; at the band/Lp ratios of 5x5-9x9 grids the
    # measured optimum is the narrowest chunk (128) — overridable for
    # experiments via DHTS_BANDED_CHUNK
    import os as _os
    if wide_ops is None:
        # default ON since round 4: device-measured wins at every size,
        # bit-identical incl. gradients (result/wide/: slope3x3 12.47 ->
        # 11.10 us/step fwd+bwd, 5x5 1.13x, 7x7 1.12x, 9x9 1.11x)
        wide_ops = _os.environ.get("DHTS_WIDE_OPS", "1") == "1"
    _chunk_env = int(_os.environ.get("DHTS_BANDED_CHUNK", "0"))
    chunk_c = _chunk_env if (_chunk_env and Lp % _chunk_env == 0) else _LANE
    win = chunk_c + 2 * _pad
    n_chunks = Lp // chunk_c
    banded = (Lp >= 512 and band > 0 and _pad <= 2 * _LANE and
              win < Lp and not ({"ohb", "walk", "ohg", "ohmh", "ohpk",
                                 "oh4"} & set(_ablate)))
    # wide_ops + banded: the walk's hop gathers carry two extra rows
    # (leader tail pos/vel) latched at the terminating hop, so the
    # forward skips the dense [Lp, Lp] leader-field gather at wstar —
    # one of the two stated O(Lp^2) floors of the banded scaling table.
    # The backward replay keeps the differentiable wstar gather (the
    # latched rows are stop-gradient walk data). Only the early-exit
    # walk (W >= 8, which every banded scene takes) is instrumented.
    lead_latch = banded and wide_ops and W >= 8
    # Merge the four base-geometry FORWARD gather families (walk hop 0 +
    # leader latch, boundary ghosts, the 3 signal lookups, the two event
    # destination probes) into ONE banded gather_multi call: same one-hot
    # columns per block (bit-identical values), 4x fewer chunk dots and
    # one iota build per chunk instead of four. Forward-only: the
    # early-exit kernel is never differentiated (the backward kernel
    # replays from residuals), so the per-family sg/diff split is moot.
    merge_fwd = (lead_latch and
                 _os.environ.get("DHTS_MERGE_FWD_GATHERS", "0") == "1")
    chunk_starts = tuple(
        min(max(chunk_c * j - _pad, 0), Lp - win)
        for j in range(n_chunks)) if banded else ()

    def _mk_windows(mm):
        """Window geometry for indices within ``mm`` adjacency steps of
        the column lane: route edges are adjacency edges, so walk hop
        mm-1's target lies within mm*band of the walking lane. None when
        the window wouldn't beat a dense gather."""
        padm = _LANE * int(np.ceil(mm * band / _LANE)) if band else _LANE
        winm = chunk_c + 2 * padm
        if winm >= Lp:
            return None
        return winm, tuple(min(max(chunk_c * j - padm, 0), Lp - winm)
                           for j in range(n_chunks))
    # Walk hops peeled out of the early-exit loop through banded windows
    # (wide_ops): hop o's target is o+1 adjacency steps from the walking
    # lane, so any hop whose (o+1)-step window still beats a dense gather
    # is executed unconditionally BEFORE the loop through that window —
    # ITSCP walks typically terminate within 1-3 hops, so with enough
    # hops peeled the dense while_loop usually runs zero iterations.
    # 7x7 fits hop 1 (doubled band); 9x9 fits hops 1-3. At 5x5 the
    # doubled window already exceeds the lane width and every hop past 0
    # stays in the dense loop. Capped at 3 peeled hops: deeper hops are
    # rare, and a peeled hop's gather runs every step even when all
    # walks have terminated.
    # DHTS_PEEL_CAP: max hops peeled past hop 0 (default 3 on the
    # non-compact path, 0 under the compact walk — see below). Device A/B
    # at 7x7/9x9 (result/merge/peel{7,9}.json) measured caps 0-3 within
    # +-0.5% — the RTT-cancelling slope probe (bench/probe_split.py)
    # puts a win=640 banded gather at ~0.2 us, so neither the peeled
    # wide-window gathers nor the dense hops they replace are a
    # material cost at any measured size. The knob stays for per-scene
    # A/Bs. (result/merge/probe_banded.json's apparent superlinear
    # window cost was a measurement artifact: insufficient tunnel-RTT
    # amortization — trust only slope-method probes.)
    # (defined before the peel block: the peel default depends on it)
    compact_walk = (wide_ops and W >= 8 and
                    _os.environ.get("DHTS_COMPACT_WALK", "1") == "1")
    # Under the compact walk the peeled hops are REDUNDANT work — the
    # compact phase folds every remaining hop in one wide gather anyway,
    # so each peeled window gather is a pure extra cost: 9x9 A/B
    # measured peel 0 at 130.6 vs 135.9 us/step (-3.9%,
    # result/merge/split9sgp0.json) — hence default 0 when compact.
    peel_cap = int(_os.environ.get("DHTS_PEEL_CAP",
                                   "0" if compact_walk else "3"))
    peel_geoms = []
    if lead_latch:
        for _o in range(1, min(W, 1 + peel_cap)):
            _g = _mk_windows(_o + 1)
            if _g is None:
                break
            peel_geoms.append(_g)
    hop1_banded = len(peel_geoms) >= 1
    # Occupancy-compacted walk (round 5): on ITSCP scenes only a handful
    # of micro lanes hold a head vehicle per step (measured 7-11 at
    # 7x7/9x9, result/merge/walk_trips.json) while the dense early-exit
    # while_loop runs 20-32 full-[1,Lp]-width iterations (the max trip
    # over lanes). The compact phase ranks the still-walking lanes with a
    # lower-triangular prefix dot, packs them into <= S_cw slot columns
    # via a slot one-hot, runs ALL remaining hops as ONE [*, nW*S_cw]
    # wide gather + a latch fold over [1, S_cw] rows, and scatters the
    # terminating state back. Lanes past slot capacity (never seen on
    # ITSCP scenes; capacity 128 vs ~11 walkers) fall through to the
    # dense while_loop unchanged, so the loop runs ZERO iterations in the
    # common case. Values are bit-identical: same one-hot columns, same
    # HIGHEST contractions, same latch fold order per lane (reference
    # semantics: road/network/road_network.py:429-580).
    # Save the replay's differentiable gather VALUES as per-step
    # residuals (round-5: see ``with_saved``); needs the early-exit wide
    # banded forward (whose gt/sig3/boundary/Gdf values are the pinned
    # bit-identical sources) and the unmerged gather layout.
    # default ON since round 5: device-verified bit-identical at 5x5 and
    # 9x9 (grad diff exactly 0.0) with 1.12x / 1.17x whole-step wins
    # (result/merge/sg_check.json)
    save_gathers = (lead_latch and not merge_fwd and
                    _os.environ.get("DHTS_SAVE_GATHERS", "1") == "1")
    S_cw = _round_up(int(_os.environ.get("DHTS_COMPACT_SLOTS", "128")),
                     _LANE)

    # ---- static constants -------------------------------------------------
    def row(x, dtype=np.float32, fill=0.0):
        out = np.full((1, Lp), fill, dtype)
        out[0, :L] = np.asarray(x)
        return out

    num_cell = np.asarray(spec.num_cell)
    lane_mask = row(np.ones(L))
    is_macro = row(np.asarray(spec.is_macro).astype(np.float32))
    length_row = row(np.asarray(spec.length), fill=1.0)
    cell_len = row(np.asarray(spec.cell_length), fill=1.0)
    coef = (dt / cell_len).astype(np.float32)
    approaching = row(np.asarray(meta.approaching))
    is_we = row(np.asarray(meta.is_we))
    has_prev = row(np.asarray(meta.has_prev))
    num_prev = row(np.asarray(spec.num_prev), np.int32, 0)
    num_next = row(np.asarray(spec.num_next), np.int32, 0)
    prev_np = np.asarray(spec.prev_lanes)
    next_np = np.asarray(spec.next_lanes)
    prev0 = row(prev_np[:, 0], np.int32, -1)
    next0 = row(next_np[:, 0], np.int32, -1)
    # adjacency lists as [K, Lp] (for capacitor slots and arbitration)
    next_k = np.full((K, Lp), -1, np.int32)
    prev_k = np.full((K, Lp), -1, np.int32)
    next_k[:, :L] = next_np.T
    prev_k[:, :L] = prev_np.T

    cmask = np.zeros((Cp, Lp), np.float32)
    first_pick = np.zeros((Cp, Lp), np.float32)
    last_pick = np.zeros((Cp, Lp), np.float32)
    for li in range(L):
        n = int(num_cell[li])
        if np.asarray(spec.is_macro)[li]:
            cmask[:n, li] = 1.0
            first_pick[0, li] = 1.0
            last_pick[max(n - 1, 0), li] = 1.0
    inter_pick = np.zeros((NIp, Lp), np.float32)
    for li in range(L):
        inter_pick[int(np.asarray(meta.inter)[li]), li] = 1.0
    # default vehicle params (emission/injection use defaults,
    # micro_vehicle.py:30-72)
    dflt = dict(accel_max=u_max, accel_pref=0.8 * u_max,
                target_speed=0.9 * u_max, min_space=0.1 * veh_len,
                time_pref=0.1, length=veh_len)

    # Phase-progress table precomputed on host in f64 -> f32 (the scan env's
    # ``signal_progress_table``): in-kernel f32 division can land 1 ulp off
    # the correctly rounded quotient and flip the hard action-vs-progress
    # gate on exact ties.
    NSFp = _round_up(nsf, _SUBLANE)
    prog_tab = np.zeros((NSFp, 1), np.float32)
    prog_tab[:nsf, 0] = np.minimum(np.arange(nsf) / nsf, 1.0)
    # wide_ops: the per-step phase one-hot and signal progress are pure
    # functions of t — precompute [T, NPp, 2] host-side (col 0: phase
    # one-hot; [0, 1]: progress) and stream one tiny block per grid step
    # instead of rebuilding two iota compares + a table lookup in-kernel
    # (and again in every backward replay). Same formulas, bit-exact.
    _steps = np.arange(T)
    sig_tab = np.zeros((T, NPp, 2), np.float32)
    sig_tab[_steps, np.minimum(_steps // nsf, n_phases - 1), 0] = 1.0
    sig_tab[:, 0, 1] = prog_tab[_steps % nsf, 0]

    # ---- episode packing (block-diagonal scenes in one kernel) ------------
    # ``episodes`` > 1 runs B independent scenarios side by side in the lane
    # axis (dead padding lanes become live lanes of another episode). The
    # physics is lane-local and needs nothing; only the RMS statistics, the
    # queue reduction and the reward must become per-episode — via one-hot
    # lane->episode matmuls. B == 1 keeps the original scalar reductions
    # bit-exactly.
    packed = episodes > 1
    B_ep = int(episodes)
    Bp = _round_up(B_ep, _LANE) if packed else 1
    if packed:
        epl = np.asarray(ep_of_lane, np.int64)
        assert epl.shape == (L,), (epl.shape, L)
        ep_pick_np = np.zeros((Lp, Bp), np.float32)
        ep_pick_np[np.arange(L), epl] = 1.0

    # The K predecessor rows laid side by side as ONE [1, K*Lp] row: the
    # arbitration one-hot is built from this host-side constant because an
    # in-kernel concat of [K, Lp] sublane slices hits Mosaic's
    # "result/input offset mismatch on non-concat dimension" (slices at
    # sublane offset k>0 cannot be concatenated along lanes).
    prev_cat = prev_k.reshape(1, K * Lp).copy()
    # The arbitration one-hot is FULLY STATIC (predecessor lists are scene
    # geometry), so build it host-side and keep it VMEM-resident instead of
    # re-materializing an iota compare every step — gated on size so huge
    # scenes (9x9: 16 MB) don't eat the scoped-VMEM budget.
    hoist_ohpk = (not banded) and K * Lp * Lp * 4 <= 8 * 1024 * 1024
    if hoist_ohpk:
        ohpk_c = (np.arange(Lp, dtype=np.int32)[:, None] ==
                  prev_cat).astype(np.float32)

    consts = dict(lane_mask=lane_mask, is_macro=is_macro, length=length_row,
                  cell_len=cell_len, coef=coef, approaching=approaching,
                  is_we=is_we, has_prev=has_prev, num_prev=num_prev,
                  num_next=num_next, prev0=prev0, next0=next0,
                  next_k=next_k, prev_k=prev_k, prev_cat=prev_cat,
                  cmask=cmask,
                  first_pick=first_pick, last_pick=last_pick,
                  inter_pick=inter_pick, prog=prog_tab)
    if hoist_ohpk:
        consts["ohpk_c"] = ohpk_c
    if banded:
        # the arbitration one-hot is static -> per-chunk banded windows
        # built host-side ([n_chunks, wt*128, K*128]: 2.7 MB at 7x7 and
        # 7 MB at 9x9, vs 16 MB for the dense hoist the size gate
        # rejects at 9x9)
        ohpk_b = np.zeros((n_chunks, win, K * chunk_c), np.float32)
        for j, st in enumerate(chunk_starts):
            for k in range(K):
                idx = prev_k[k, j * chunk_c:(j + 1) * chunk_c]
                rel = np.where(idx >= 0, idx - st, -1)
                valid = idx >= 0
                assert ((rel[valid] >= 0) &
                        (rel[valid] < win)).all(), "band violated"
                ohpk_b[j, rel[valid], k * chunk_c +
                       np.nonzero(valid)[0]] = 1.0
        consts["ohpk_b"] = ohpk_b
    if packed:
        consts["ep_pick"] = ep_pick_np
        consts["ep_pick_t"] = ep_pick_np.T.copy()
    if wide_ops:
        # hop-block index row for the wide walk latch (host-built: an
        # in-kernel iota//Lp is an avoidable Mosaic lowering risk)
        consts["blkw"] = np.repeat(np.arange(W, dtype=np.int32),
                                   Lp)[None]
    if {"ohb", "walk", "ohg", "ohmh", "ohpk", "oh4"} & set(_ablate):
        # Profiling rig only: a resident [Lp, 4Lp] block-identity used to
        # stub one-hot BUILDS named in ``_ablate`` (keeps every matmul's
        # shape and VMEM read traffic, removes the iota-compare
        # construction). Results are numerically WRONG — the rig exists
        # purely to attribute per-family build cost on hardware.
        # NB [Lp, max(4,W,K)*Lp] f32 fits VMEM at 3x3 ONLY (96-245 MB at
        # 7x7/9x9) — one-hot family ablation is a 3x3 instrument; the
        # physics stubs (riemann/idm) don't allocate it and keep the
        # production banded path, so they attribute at every scale.
        consts["dummy_oh"] = np.tile(np.eye(Lp, dtype=np.float32),
                                     (1, max(4, W, K)))
    const_names = sorted(consts.keys())
    # The backward (replay) kernel never walks, so the compact-walk
    # prefix-rank triangle is omitted from its inputs: at 9x9 the replay
    # already runs at ~116 of the 127 MB scoped-VMEM limit and the extra
    # [Lp, Lp] f32 (7.9 MB) would tip it over.
    bwd_const_names = tuple(k for k in const_names if k != "lt_strict")

    def ep_sum(row, cn):
        """[1, Lp] per-lane values -> per-episode sums ([1, Bp]) when
        packed, a scalar otherwise (bit-exact legacy reduction)."""
        if not packed:
            return jnp.sum(row)
        return jnp.dot(row, cn["ep_pick"],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def ep_spread(per_ep, cn):
        """Per-episode row [1, Bp] -> per-lane row [1, Lp] (identity for
        the scalar single-episode case)."""
        if not packed:
            return per_ep
        return jnp.dot(per_ep, cn["ep_pick_t"],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def soft(x, c):
        return jax.nn.sigmoid(jnp.clip(x * c, -16.0, 16.0))

    def stg(hard_val, soft_val):
        """Straight-through gate: forward = ``hard_val`` (the hard
        kernel's threshold value), backward = d(``soft_val``). No-op in
        plain soft mode."""
        if not st_mode:
            return soft_val
        return soft_val + jax.lax.stop_gradient(
            hard_val.astype(jnp.float32) - soft_val)

    def gate(x, c):
        if not diff:
            return (x > 0).astype(jnp.float32)
        return stg((x > 0), soft(x, c))

    def oh_l(idx_row):
        """[Lp, Lp] one-hot columns of a [1, Lp] int row (invalid -> zero)."""
        return (jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0) ==
                idx_row).astype(jnp.float32)

    def oh_cat(idx_cat):
        """[Lp, M*Lp] one-hot blocks of an already-concatenated [1, M*Lp]
        index row (one iota compare; block m's columns match
        ``oh_l(idx_cat[:, m*Lp:(m+1)*Lp])`` exactly)."""
        return (jax.lax.broadcasted_iota(
            jnp.int32, (Lp, idx_cat.shape[1]), 0) == idx_cat).astype(
            jnp.float32)

    def oh_multi(idx_rows):
        """[Lp, M*Lp] horizontal concat of the M one-hot blocks of M
        [1, Lp] index rows, built with ONE iota compare instead of M —
        feeding ONE wide gather matmul instead of M narrow ones. Each
        block's columns match :func:`oh_l` exactly (invalid ids -> zero
        columns), so sliced results are bit-identical to per-index
        gathers."""
        return oh_cat(jnp.concatenate(idx_rows, axis=1))

    def gather_multi(rows_cat, idx_rows, cn=None, sg=False,
                     prebuilt_chunks=None, window_geom=None):
        """Gather a [N, Lp] row stack at M ADJACENCY-class index rows ->
        [N, M*Lp] in the ``oh_multi`` block layout. Dense one-hot matmul
        below the banded threshold; chunked block-band dots above it
        (``banded`` docstring at the top of this function's module scope).
        ``prebuilt_chunks``: a [n_chunks, wt*128, M*128] resident constant
        of per-chunk window one-hots (static index rows).
        ``window_geom``: (win, chunk_starts) override for index rows with
        a wider band bound (e.g. walk hop 1 via ``_mk_windows(2)``)."""
        if not banded:
            out = jnp.dot(rows_cat, oh_multi(idx_rows),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            return jax.lax.stop_gradient(out) if sg else out
        g_win, g_starts = window_geom or (win, chunk_starts)
        M = (len(idx_rows) if prebuilt_chunks is None
             else prebuilt_chunks.shape[2] // chunk_c)
        outs = []
        for j in range(n_chunks):
            st = g_starts[j]
            if prebuilt_chunks is None:
                rel = jnp.concatenate(
                    [jnp.where(ir[:, j * chunk_c:(j + 1) * chunk_c] >= 0,
                               ir[:, j * chunk_c:(j + 1) * chunk_c] - st,
                               -1)
                     for ir in idx_rows], axis=1)  # [1, M*chunk_c]
                ohj = (jax.lax.broadcasted_iota(
                    jnp.int32, (g_win, M * chunk_c), 0) == rel).astype(
                    jnp.float32)
            else:
                ohj = prebuilt_chunks[j]
            outs.append(jnp.dot(rows_cat[:, st:st + g_win], ohj,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST))
        res = jnp.concatenate(
            [jnp.concatenate([outs[j][:, m * chunk_c:(m + 1) * chunk_c]
                              for j in range(n_chunks)], axis=1)
             for m in range(M)], axis=1)
        return jax.lax.stop_gradient(res) if sg else res

    def gather_rows(rows, idx_row, oh=None):
        """Gather many [*, Lp] rows at the SAME lane index in one MXU pass:
        a [1, Lp] x [Lp, Lp] one-hot matmul wastes the systolic array's
        rows, so every co-indexed gather is stacked into one [N, Lp] LHS.
        ``oh``: reuse a prebuilt one-hot (the [Lp, Lp] iota compare is the
        expensive part, not the matmul)."""
        mat = jnp.concatenate(rows, axis=0)
        return jnp.dot(mat, oh_l(idx_row) if oh is None else oh,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def gather_rows_sg(rows, idx_row, oh=None):
        """Stop-gradient gather for rows whose cotangent is structurally
        zero (flags, counts, ids, static lengths, IDM params): the
        backward pass then neither transposes the matmul nor rebuilds its
        one-hot. Values are identical to :func:`gather_rows`."""
        return jax.lax.stop_gradient(gather_rows(rows, idx_row, oh))

    def with_saved(f, saved, *args):
        """Replay-only: return ``saved`` — the forward kernel's
        bit-identical value of ``f(*args)``, streamed per step as a
        residual — while wiring the cotangent through f's true vjp.

        The round-5 9x9 census (result/merge/ablate9g.json) attributes
        ~70 us/step nominal to the replay's differentiable gathers (bgt
        38.8 + bbnd 16.4 + bconv 15.0 of a 151.5 us fwd+bwd step): under
        the dots-only checkpoint policy each gather's one-hot is built
        TWICE per backward step (replay forward + transpose rebuild) and
        its forward dot re-runs although the forward kernel already
        computed the identical value. This skips the replay-forward
        build+dot entirely; the transpose pass (``g_bwd`` below) runs
        f's vjp once, which rebuilds the one-hot there and sinks the
        cotangent into the same dot transpose as before — gradient
        bit-identical by construction."""
        @jax.custom_vjp
        def g(saved, *args):
            return saved

        def g_fwd(saved, *args):
            return saved, args

        def g_bwd(res, cot):
            # f's forward value is discarded — XLA DCEs the dot and keeps
            # only the one-hot build the transpose needs
            _, vjp = jax.vjp(f, *res)
            return (jnp.zeros_like(cot),) + tuple(vjp(cot))

        g.defvjp(g_fwd, g_bwd)
        return g(saved, *args)

    def blk_tree(x, op, w):
        """Pairwise reduction over the ``w`` lane-blocks of a fresh
        [N, w*Lp] row stack -> [N, Lp], in ceil(log2 w) wide ops instead
        of w-1 narrow ones. Only used with order-insensitive exact ops
        (int/bool min/max), so the tree order is value-identical to a
        sequential fold. Operands are lane-axis slices of fresh
        (sublane-offset-0) values — the Mosaic-safe slice pattern the
        hop-block gathers already rely on."""
        extra = None
        while w > 1:
            if w % 2:
                last = x[:, (w - 1) * Lp:w * Lp]
                extra = last if extra is None else op(extra, last)
                w -= 1
            h = w // 2
            x = op(x[:, :h * Lp], x[:, h * Lp:w * Lp])
            w = h
        return x if extra is None else op(x, extra)

    def head_oh(count):
        """[Vp, Lp] one-hot of the head slot (count-1), falling back to
        slot 0 when the lane is empty — the same clip the scan model uses
        (``network.micro_head_info``). The fallback keeps masked-out head
        fields at benign real values (e.g. nonzero vehicle length), so the
        backward pass never multiplies a zero cotangent by an inf produced
        in a dead branch."""
        h = jnp.maximum(count - 1, 0)
        return (jax.lax.broadcasted_iota(jnp.int32, (Vp, Lp), 0) ==
                h).astype(jnp.float32)

    def sum0(x, keepdims=True):
        """Axis-0 sum as a pairwise halving tree of adds.

        Mosaic lowers a many-sublane ``jnp.sum`` reduce pathologically
        (round-4 lesson: 73-145 us on a [R, k*Lp] compare result, vs
        ~free for <=8 rows) — the round-5 9x9 census measured the
        batched route pick ([32, 6*Lp] mul+sum) alone at ~40 us/step.
        A tree of plain row-block adds runs at normal elementwise cost.
        EXACTNESS: every caller sums a one-hot-masked product with at
        most ONE nonzero term per column, so any association order
        yields the bit-identical result — do NOT use this for real
        multi-term sums (q_lane etc.), whose fp rounding would change
        vs the scan env."""
        while x.shape[0] > 1:
            n = x.shape[0]
            h = n // 2
            y = x[:h] + x[h:2 * h]
            x = jnp.concatenate([y, x[2 * h:]], axis=0) if n % 2 else y
        return x if keepdims else x[0]

    def pick_v(arr, ohv):
        """Pick one row per lane from [Vp, Lp] via a [Vp, Lp] one-hot.

        Stays ``jnp.sum``: Vp is small, the whole head-pick family
        measured ~3 us at 9x9 (ablate9g ``-heads``), and this is a
        DIFFERENTIABLE pick — not worth touching its vjp structure."""
        return jnp.sum(arr * ohv, axis=0, keepdims=True)

    def pick_route(route, ohv):
        """route [Vp, R, Lp] -> [R, Lp] at each lane's one-hot slot."""
        return jnp.sum(route * ohv[:, None, :], axis=0)

    def pick_r(route_rl, j_row):
        """route_rl [R, Lp], j_row [1, Lp] -> entries [1, Lp] (-1 invalid)."""
        ohr = ((jax.lax.broadcasted_iota(jnp.int32, (R, Lp), 0) == j_row) &
               (j_row >= 0) & (j_row < R)).astype(jnp.float32)
        val = sum0(route_rl.astype(jnp.float32) * ohr)
        ok = (j_row >= 0) & (j_row < R)
        return jnp.where(ok, val.astype(jnp.int32), -1)

    def tail_insert(arr, new_row, mask_row):
        """Shift [Vp, ...] up by one slot where mask; write slot 0."""
        shifted = jnp.concatenate([new_row[None], arr[:-1]], axis=0)
        m = mask_row > 0 if mask_row.dtype != jnp.bool_ else mask_row
        return jnp.where(m, shifted, arr)

    # =====================================================================
    def step(carry, t, action2d, sched_t, mnext_t, mprev_t, rand_t,
             inj_routes, emit_routes, cn, early_exit: bool = False,
             walk_saved=None, walk_saved_f=None, head_saved=None,
             sig_t=None, conv_saved=None, ids_saved=None, gsv_saved=None):
        # Per-vehicle IDM parameters are NOT carried: every vehicle in the
        # ITSCP scene is created with the same ``dflt`` values (injection
        # and emission both use default_micro_vehicle semantics,
        # micro_vehicle.py:30-72; transfers copy the source vehicle), so
        # the six [Vp, Lp] param planes the scan env carries are constant
        # by induction — the kernel substitutes the scalars everywhere,
        # deleting 12 tail-insert shifts, 6 gather rows and ~96 KB/step of
        # residual traffic with bit-identical values.
        (r, y, pos, vel, av, count, route, ridx, cap, inj_left, cursor,
         ss_tot, ss_cnt, sg_tot, sg_cnt) = carry
        micro_row = 1.0 - cn["is_macro"]

        # ---- signals
        if sig_t is not None:
            # wide_ops: phase one-hot + progress streamed per step
            # (host-precomputed ``sig_tab``; same formulas, bit-exact)
            ph_oh = sig_t[:, 0:1]
            progress = jnp.sum(sig_t[:1, 1:2])
        else:
            phase = jnp.minimum(t // nsf, n_phases - 1)
            ph_oh = (jax.lax.broadcasted_iota(jnp.int32, (NPp, 1), 0) ==
                     phase).astype(jnp.float32)
            pr_oh = (jax.lax.broadcasted_iota(jnp.int32, (NSFp, 1), 0) ==
                     (t % nsf)).astype(jnp.float32)
            progress = jnp.sum(cn["prog"] * pr_oh)
        a_row = jnp.sum(action2d * ph_oh, axis=0, keepdims=True)
        a_lane = jnp.dot(a_row, cn["inter_pick"],
                         preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        if wide_ops and diff:
            # both gate orientations in one stacked sigmoid chain
            d_ap = a_lane - progress
            d2 = jnp.concatenate([d_ap, -d_ap], axis=0)
            g2 = stg(d2 > 0, soft(d2, 32.0 * gsc))
            g_axis = jnp.where(cn["is_we"] > 0, g2[0:1], g2[1:2])
        else:
            g_axis = jnp.where(cn["is_we"] > 0,
                               gate(a_lane - progress, 32.0 * gsc),
                               gate(progress - a_lane, 32.0 * gsc))
        sig = jnp.where(cn["approaching"] > 0, g_axis, 1.0)

        incoming = jnp.where(cn["has_prev"] > 0, -1.0, sched_t)

        # ---- injection (env lines: free space, rand < incoming, pool left)
        if conv_saved is not None:
            # replay: the injection flag was saved (conv_i row 5), so the
            # free-space/rand predicate chain is skipped
            im = conv_saved[5:6] > 0
        else:
            free = jnp.where(count > 0, pos[:1] - 0.5 * veh_len,
                             cn["length"])
            im = ((cn["has_prev"] == 0) & (micro_row > 0) &
                  (free > 0.5 * veh_len) & (rand_t < incoming) &
                  (inj_left > 0) & (count < V))
        pos = tail_insert(pos, jnp.zeros((Lp,)), im)
        vel = tail_insert(vel, jnp.zeros((Lp,)), im)
        av = tail_insert(av, jnp.full((Lp,), veh_len), im)
        if head_saved is None and "inj" not in _ablate:
            pool_idx = jnp.clip(P - inj_left, 0, P - 1)
            ohp = ((jax.lax.broadcasted_iota(jnp.int32, (P, 1, Lp), 0) ==
                    pool_idx[None]).astype(jnp.float32))
            new_route = jnp.sum(inj_routes.astype(jnp.float32) * ohp,
                                axis=0).astype(jnp.int32)  # [R, Lp]
            route = jnp.where(im[None], jnp.concatenate(
                [new_route[None], route[:-1]], axis=0), route)
            ridx = tail_insert(ridx, jnp.zeros((Lp,), jnp.int32), im)
        # "inj" census stub: the [P, 1, Lp] pool one-hot + [P, R, Lp]
        # pool reduce + [Vp, R, Lp] route shift removed (values WRONG)
        count = count + im.astype(jnp.int32)
        inj_left = inj_left - im.astype(jnp.int32)

        # ---- macro boundary (signal-blended ghosts)
        u = arz.compute_u(r, y, u_max)
        r_last = jnp.sum(r * cn["last_pick"], axis=0, keepdims=True)
        u_last = jnp.sum(u * cn["last_pick"], axis=0, keepdims=True)
        r_first = jnp.sum(r * cn["first_pick"], axis=0, keepdims=True)
        u_first = jnp.sum(u * cn["first_pick"], axis=0, keepdims=True)
        adjp = jnp.where(cn["num_prev"] == 1, cn["prev0"], mprev_t)
        adjn = jnp.where(cn["num_next"] == 1, cn["next0"], mnext_t)

        def boundary_gather(extra_idx=None):
            """ONE wide gather for the three boundary index rows (adjp,
            adjn, mprev) — and, on the plain unrolled-walk forward, the W
            walk hops fused in as extra blocks (``extra_idx`` [1, W*Lp]):
            one iota build + one matmul for BOTH families. LHS rows 6-8
            repeat [is_macro, count, length] so the walk slice is a
            contiguous sublane range (a row-subset concat of slices at
            different sublane offsets does not lower on Mosaic). Each
            sliced block is bit-identical to the former per-family
            gathers."""
            idx_rows = [adjp, adjn, mprev_t]
            lhs = [cn["is_macro"], r_last, u_last, r_first, u_first, sig]
            if extra_idx is not None:
                idx_rows.append(extra_idx)
                lhs += [cn["is_macro"], count_row, cn["length"]]
            if banded and extra_idx is None:
                return gather_multi(jnp.concatenate(lhs, axis=0),
                                    idx_rows)
            ohb = (cn["dummy_oh"][:, :3 * Lp] if "ohb" in _ablate else
                   oh_multi(idx_rows))
            return jnp.dot(jnp.concatenate(lhs, axis=0), ohb,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        def boundary_rows_v(mac_p, rl_p, ul_p, mac_n, rf_n, uf_n, sig_mp):
            """Boundary ghost values from the 7 gathered rows (values
            form, so the merged forward gather can feed its own block
            slices; bit-identical to :func:`boundary_rows`)."""
            use_nb_l = ((cn["num_prev"] > 0) & (adjp >= 0) &
                        (mac_p > 0.5))
            hp_b = cn["has_prev"] > 0
            gl_r = jnp.where(hp_b, jnp.where(use_nb_l, rl_p, 0.0),
                             incoming)
            gl_u = jnp.where(hp_b, jnp.where(use_nb_l, ul_p, u_max),
                             arz.compute_u_eq(incoming, u_max))
            # prev_sig follows mprev_t, which equals adjp only on
            # single-prev lanes -> its own gather
            prev_sig = jnp.where(~hp_b, 1.0,
                                 jnp.where(mprev_t < 0, 0.0, sig_mp))
            bl_r = gl_r * prev_sig
            bl_u = gl_u * prev_sig + u_max * (1.0 - prev_sig)
            use_nb_r = ((cn["num_next"] > 0) & (adjn >= 0) &
                        (mac_n > 0.5))
            gr_r = jnp.where(use_nb_r, rf_n, 0.0)
            gr_u = jnp.where(use_nb_r, uf_n, u_max)
            s_own = stg(sig > 0.5, soft(sig - 0.5, 32.0 * gsc)) if diff else \
                (sig > 0.5).astype(jnp.float32)
            br_r = gr_r * s_own + (1.0 - s_own)
            br_u = gr_u * s_own
            return bl_r, bl_u, br_r, br_u

        def boundary_rows(gb):
            return boundary_rows_v(
                gb[0:1, :Lp], gb[1:2, :Lp], gb[2:3, :Lp],
                gb[0:1, Lp:2 * Lp], gb[3:4, Lp:2 * Lp],
                gb[4:5, Lp:2 * Lp], gb[5:6, 2 * Lp:3 * Lp])

        # ---- micro leader search (window form of find_micro_leader)
        if "heads" in _ablate:
            # census stub: head one-hot + the 3 field picks + the
            # [Vp, R, Lp] route-container pick replaced by constants
            # (values WRONG; attributes the head-pick family at scale)
            ohv_h = jnp.zeros((Vp, Lp))
            hv_pos = hv_vel = hv_a = jnp.zeros((1, Lp))
        else:
            ohv_h = head_oh(count)
            hv_pos = pick_v(pos, ohv_h)
            hv_vel = pick_v(vel, ohv_h)
            hv_a = pick_v(av, ohv_h)
        if "heads" in _ablate:
            route_h = jnp.zeros((R, Lp))
            ridx_h = jnp.zeros((1, Lp), jnp.int32)
        elif head_saved is None:
            route_h = pick_route(route, ohv_h)  # [R, Lp]
            ridx_h = pick_v(ridx.astype(jnp.float32),
                            ohv_h).astype(jnp.int32)
        elif head_saved[0] is None:
            # wide_ops backward replay: every route-derived value the step
            # needs (the walk's prev/curr/next lane ids, the conversion
            # outcomes) rides other residuals, so the head route row /
            # route index are neither saved nor read at all
            route_h = ridx_h = None
        else:
            # backward replay: the head vehicle's route row and route index
            # were saved per step by the forward (they are discrete and
            # carry no gradient), so the [Vp, R, Lp] route container is
            # never materialized in the backward at all
            route_h = head_saved[0].astype(jnp.float32)
            ridx_h = head_saved[1]
        h_exists = count > 0

        count_row = count.astype(jnp.float32)
        # Window walk, split in two phases (the walk's only differentiable
        # content is the leader's tail fields and the head's own position):
        #
        # Phase 1 — DISCRETE, stop-gradient: per offset o, gather only
        # [is_macro, count, length] of the lane o+1 route positions ahead,
        # and latch the terminating hop's lane id ``wstar`` (first occupied
        # micro lane) and the gap accumulated up to it. Values are
        # bit-identical to the fused single-loop walk (same gathers, same
        # float order); no cotangents flow, so the backward pass neither
        # transposes nor rebuilds these W one-hot matmuls — at 5x5+ grids
        # W hits the R-1 cap and this was ~60% of fwd+bwd step time.
        #
        # Phase 2 — ONE differentiable gather at ``wstar`` for the leader's
        # (tail position, tail speed, tail length); the head-position
        # gradient is re-attached straight-through onto the stop-gradient
        # accumulated gap (value unchanged: base - stop_grad(base) == 0).
        base = cn["length"] - hv_pos - veh_len * 0.5

        def walk_latch(wl, gw, done, found, wstar, cdel_st, cur_delta,
                       *lead):
            """One hop's latch logic on already-gathered [is_macro, count,
            length] rows (elementwise on [1, Lp] rows only). With
            ``lead_latch``, ``gw`` carries two extra rows (leader tail
            pos/vel) latched at the terminating hop — the values the
            banded forward otherwise re-gathers densely at ``wstar``."""
            exists = wl >= 0
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
            if lead:
                lead = (jnp.where(term_leader, gw[3:4], lead[0]),
                        jnp.where(term_leader, gw[4:5], lead[1]))
            return (done, found, wstar, cdel_st, cur_delta) + lead

        def walk_latch_wide(wl_cat, GW):
            """All W hops' latch logic in one pass over the [*, W*Lp] wide
            hop blocks, replacing the W-fold of :func:`walk_latch`
            (~12 narrow ops/hop with a serial dependency chain) by ~15
            wide ops plus three log-depth block reductions. The walk's
            sequential semantics reduce to FIRST-STOP selection: a hop
            terminates the walk iff its target is missing, macro, or an
            occupied micro lane, so the terminating hop is the block-min
            of stop positions, ``found`` is whether that hop stopped on
            an occupied micro lane, and the accumulated gap is the masked
            prefix of hop lengths below it. Values are bit-identical to
            the fold: all selections are exact int/bool ops, and the gap
            sum keeps the fold's left-to-right float addition order
            (masked adds of exact 0.0)."""
            exists = wl_cat >= 0
            w_macro = GW[0:1] > 0.5
            occupied = exists & ~w_macro & (GW[1:2] > 0.5)
            stop = ~exists | w_macro | occupied
            blk = cn["blkw"]  # host-built hop-block index row
            ostar = blk_tree(jnp.where(stop, blk, W), jnp.minimum, W)
            tile = jnp.concatenate([ostar] * W, axis=1)
            sel = (blk == tile) & occupied
            # two single-row trees (not one [2, W*Lp] tree): row 1 of a
            # 2-row result lives at sublane offset 1, which would poison
            # wstar for the downstream oh_multi lane concat on Mosaic;
            # the rows reduce independently, so this is value-identical
            fnd = blk_tree(sel.astype(jnp.int32), jnp.maximum, W)
            mx1 = blk_tree(jnp.where(sel, wl_cat, -1), jnp.maximum, W)
            found = (fnd > 0) & h_exists
            wstar = jnp.where(found, mx1, -1)
            # gap below the terminating hop, in fold addition order
            before = (blk < tile).astype(jnp.float32)
            acc = jax.lax.stop_gradient(base)
            for o in range(W):
                acc = acc + (GW[2:3, o * Lp:(o + 1) * Lp] *
                             before[:, o * Lp:(o + 1) * Lp])
            cdel_st = jnp.where(found, acc, 0.0)
            return found, wstar, cdel_st

        def walk_hop(o, done, found, *rest):
            j = ridx_h + 1 + o
            wl = pick_r(route_h, j)  # [1, Lp] lane id or -1
            rows = [cn["is_macro"], count_row, cn["length"]]
            if lead_latch:
                rows += [pos[:1], vel[:1]]
            gw = gather_rows_sg(rows, wl,
                                oh=(cn["dummy_oh"][:, :Lp]
                                    if "walk" in _ablate else None))
            return walk_latch(wl, gw, done, found, *rest)

        def batched_route_pick(n_extra):
            """Route entries at (ridx-1, ridx, ridx+1 .. ridx+n_extra) for
            every lane in ONE [R, (2+n_extra)*Lp] compare + mul-sum —
            replacing 2+n_extra ``pick_r`` calls; each sliced block is
            bit-identical (same per-column sum over R)."""
            if "rpick" in _ablate:  # census stub (values WRONG)
                return jnp.full((1, (2 + n_extra) * Lp), -1, jnp.int32)
            j_cat = jnp.concatenate([ridx_h - 1, ridx_h] +
                                    [ridx_h + 1 + o for o in range(n_extra)],
                                    axis=1)
            okj = (j_cat >= 0) & (j_cat < R)
            ohr = ((jax.lax.broadcasted_iota(
                jnp.int32, (R, j_cat.shape[1]), 0) == j_cat) &
                okj).astype(jnp.float32)
            route_t = jnp.concatenate(
                [route_h.astype(jnp.float32)] * (2 + n_extra), axis=1)
            ent = sum0(route_t * ohr)
            return jnp.where(okj, ent.astype(jnp.int32), -1)

        walk0 = (~h_exists, jnp.zeros((1, Lp), jnp.bool_),
                 jnp.full((1, Lp), -1, jnp.int32), jnp.zeros((1, Lp)), base)
        boundary_out = None
        GUm = None  # the merged forward gather (merge_fwd), set below
        if walk_saved is not None:
            # backward replay: the walk's terminating state was saved as a
            # per-step residual by the forward (it is deterministic and
            # carries no gradient), so the W-hop loop is skipped entirely
            found = walk_saved[0:1] > 0
            wstar = walk_saved[1:2]
            cdel_st = walk_saved_f
            if wide_ops:
                # the head's prev/curr/next route lane ids ride the WIDE
                # [1, 5Lp] ids residual: lane-block slices keep sublane
                # offset 0, which Mosaic's tpu.concatenate requires of
                # every index row fed to oh_multi/gather_multi (rows of a
                # [5, Lp] stack live at sublane offsets 2..4 and crash
                # with "offset mismatch on non-concat dimension")
                prev_l, curr_l, next_l = (ids_saved[:, :Lp],
                                          ids_saved[:, Lp:2 * Lp],
                                          ids_saved[:, 2 * Lp:3 * Lp])
            else:
                ent = batched_route_pick(1)
                prev_l, curr_l, next_l = (ent[:, :Lp], ent[:, Lp:2 * Lp],
                                          ent[:, 2 * Lp:])
        elif early_exit:
            if wide_ops:
                # one batched pick for (prev, curr, next[, peeled-hop
                # targets])
                n_pe = len(peel_geoms)
                ent = batched_route_pick(1 + n_pe)
                prev_l, curr_l = ent[:, :Lp], ent[:, Lp:2 * Lp]
                next_l = ent[:, 2 * Lp:3 * Lp]
                wl_peel = [ent[:, (3 + i) * Lp:(4 + i) * Lp]
                           for i in range(n_pe)]
            else:
                prev_l = pick_r(route_h, ridx_h - 1)
                curr_l = pick_r(route_h, ridx_h)
                next_l = pick_r(route_h, ridx_h + 1)
            # Forward kernels only: hop until EVERY lane's walk terminated
            # (on ITSCP grids that is typically 1-3 hops, while the static
            # bound W hits the R-1 cap at 5x5+). Values are identical to
            # the unrolled walk — hops past `done` are no-ops — so the
            # backward kernel's unrolled vjp recompute stays consistent.
            # Mosaic cannot yield i1 vectors from scf loops -> carry the
            # two flag rows as int32.
            def w_cond(st):
                return (st[0] < W) & (jnp.min(st[1]) < 1)

            def w_body(st):
                o, done_i, found_i = st[0], st[1], st[2]
                out = walk_hop(o, done_i > 0, found_i > 0, *st[3:])
                return (o + 1, out[0].astype(jnp.int32),
                        out[1].astype(jnp.int32)) + out[2:]

            if banded:
                # hop 0 peeled: its target is the route successor of the
                # head's CURRENT lane (adjacency-banded, and already
                # picked as next_l), so the always-executed first hop
                # gathers banded; the loop handles hops 1+ (targets o
                # hops down the route — unbounded) densely
                gw0_rows = [cn["is_macro"], count_row, cn["length"]]
                if lead_latch:
                    gw0_rows += [pos[:1], vel[:1]]
                rows_cat0 = jnp.concatenate(gw0_rows, axis=0)
                walk0_l = walk0 + ((jnp.zeros((1, Lp)), jnp.zeros((1, Lp)))
                                   if lead_latch else ())
                # peeled hops 0..n_pe grouped by window geometry: hops
                # sharing a geometry (window widths are multiples of the
                # 128-lane pad, so neighbouring tiers often coincide)
                # gather through ONE multi-block banded call; the latch
                # fold then consumes the blocks in hop order, which is
                # bit-identical to per-hop gathers (gather_multi block
                # contract)
                geom1 = (win, chunk_starts)
                wl_all = [next_l] + (wl_peel if lead_latch else [])
                geoms = [geom1] + peel_geoms
                if merge_fwd:
                    # ONE base-geometry gather: rows 0-4 feed walk hop 0
                    # (block 0), row 9 the signal lookups (blocks 0-2),
                    # rows 0/5-8/9 the boundary ghosts (blocks 3-5), rows
                    # 0-4 the event destination probes (blocks 6 and 0)
                    rows_u = jnp.concatenate(
                        [cn["is_macro"], count_row, cn["length"], pos[:1],
                         vel[:1], r_last, u_last, r_first, u_first, sig],
                        axis=0)
                    GUm = gather_multi(
                        rows_u, [next_l, curr_l, prev_l, adjp, adjn,
                                 mprev_t, mnext_t], sg=True)
                    bu = lambda k: slice(k * Lp, (k + 1) * Lp)
                    boundary_out = boundary_rows_v(
                        GUm[0:1, bu(3)], GUm[5:6, bu(3)], GUm[6:7, bu(3)],
                        GUm[0:1, bu(4)], GUm[7:8, bu(4)], GUm[8:9, bu(4)],
                        GUm[9:10, bu(5)])
                groups = []  # [(geom, [hop, ...])]
                for i, g in enumerate(geoms[:len(wl_all)]):
                    if i == 0 and merge_fwd:
                        continue  # hop 0 latches from the merged gather
                    if groups and groups[-1][0] == g:
                        groups[-1][1].append(i)
                    else:
                        groups.append((g, [i]))
                w_init = walk0_l
                if merge_fwd:
                    w_init = walk_latch(next_l, GUm[0:5, :Lp], *w_init)
                for g, hops in groups:
                    gwc = gather_multi(rows_cat0,
                                       [wl_all[i] for i in hops],
                                       sg=True, window_geom=g)
                    for kk, i in enumerate(hops):
                        w_init = walk_latch(
                            wl_all[i], gwc[:, kk * Lp:(kk + 1) * Lp],
                            *w_init)
                o0 = len(wl_all)
                st0 = ((jnp.full((), o0, jnp.int32),
                        w_init[0].astype(jnp.int32),
                        w_init[1].astype(jnp.int32)) + w_init[2:])
            else:
                st0 = ((jnp.zeros((), jnp.int32),
                        walk0[0].astype(jnp.int32),
                        walk0[1].astype(jnp.int32)) + walk0[2:])
            o0s = len(wl_all) if banded else 0
            if compact_walk and "cwalk" in _ablate:
                # census stub (round 5): the whole compact-walk block
                # removed and done forced, so the dense loop runs zero
                # iterations — attributes the full walk-search family at
                # scales where the dummy-oh rigs cannot allocate. Values
                # are WRONG under this flag (census only).
                st0 = (st0[0], jnp.ones_like(st0[1])) + st0[2:]
            elif compact_walk and W > o0s:
                # ---- occupancy-compacted walk: pack the (few) lanes
                # whose walk is still live after the peeled hops into
                # <= S_cw slot columns, run hops o0s..W-1 as ONE wide
                # gather + an [1, S_cw] latch fold, scatter back; the
                # dense while_loop below then only handles slot-capacity
                # overflow (never on ITSCP scenes) and exits immediately.
                nWc = W - o0s
                needs = st0[1] < 1                      # still walking
                # exclusive prefix count of still-walking lanes = slot
                # rank, via a Hillis-Steele lane scan (log2(Lp) rounds of
                # pltpu.roll + masked add on exact int32 — no [Lp, Lp]
                # triangle constant eating scoped VMEM)
                needs_i = needs.astype(jnp.int32)
                lane_io = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
                inc_s = needs_i
                _k = 1
                while _k < Lp:
                    inc_s = inc_s + jnp.where(
                        lane_io >= _k, pltpu.roll(inc_s, _k, 1), 0)
                    _k *= 2
                rank_i = inc_s - needs_i
                cap_b = needs & (rank_i < S_cw)
                # slot one-hot [S_cw, Lp]: row s marks the lane ranked s
                sohT = ((jax.lax.broadcasted_iota(
                    jnp.int32, (S_cw, Lp), 0) == rank_i) &
                    cap_b).astype(jnp.float32)

                def cw_pack(x):
                    """[N, Lp] -> [N, S_cw] slot compaction (exact: one
                    1.0 per slot column under HIGHEST)."""
                    return jax.lax.stop_gradient(jax.lax.dot_general(
                        x, sohT, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST))

                route_cf = cw_pack(route_h)             # [R, S_cw]
                ridx_ci = cw_pack(ridx_h.astype(jnp.float32)
                                  ).astype(jnp.int32)
                curd_c = cw_pack(st0[5])
                # hop targets o0s..W-1 in one compact route pick
                j_cat = jnp.concatenate(
                    [ridx_ci + 1 + o for o in range(o0s, W)], axis=1)
                okj = (j_cat >= 0) & (j_cat < R)
                ohr = ((jax.lax.broadcasted_iota(
                    jnp.int32, (R, nWc * S_cw), 0) == j_cat) &
                    okj).astype(jnp.float32)
                entc = sum0(jnp.concatenate([route_cf] * nWc, axis=1) *
                            ohr)
                wl_cc = jnp.where(okj, entc.astype(jnp.int32), -1)
                rows_w = [cn["is_macro"], count_row, cn["length"]]
                if lead_latch:
                    rows_w += [pos[:1], vel[:1]]
                ohw = (jax.lax.broadcasted_iota(
                    jnp.int32, (Lp, nWc * S_cw), 0) == wl_cc).astype(
                    jnp.float32)
                GWc = jax.lax.stop_gradient(jnp.dot(
                    jnp.concatenate(rows_w, axis=0), ohw,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
                zS = jnp.zeros((1, S_cw))
                # compacted lanes are exactly the not-done ones: done and
                # found start False, wstar -1, gap 0, cur_delta carried
                wstc = (jnp.zeros((1, S_cw), jnp.bool_),
                        jnp.zeros((1, S_cw), jnp.bool_),
                        jnp.full((1, S_cw), -1, jnp.int32), zS, curd_c)
                if lead_latch:
                    wstc = wstc + (zS, zS)
                for o in range(nWc):
                    wstc = walk_latch(wl_cc[:, o * S_cw:(o + 1) * S_cw],
                                      GWc[:, o * S_cw:(o + 1) * S_cw],
                                      *wstc)
                # scatter back. wstar gets its OWN dot so it lands at
                # sublane offset 0: it feeds downstream oh_multi lane
                # concats, which real Mosaic rejects for offset rows
                # (Pallas lessons); the arithmetic-only rows share one.
                def cw_scat(rows):
                    return jax.lax.stop_gradient(jnp.dot(
                        jnp.concatenate(rows, axis=0) if len(rows) > 1
                        else rows[0], sohT,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST))

                s_wstar = cw_scat([wstc[2].astype(jnp.float32)])
                arith = [wstc[1].astype(jnp.float32), wstc[3], wstc[4]]
                if lead_latch:
                    arith += [wstc[5], wstc[6]]
                s_ar = cw_scat(arith)
                st0 = ((st0[0],
                        jnp.where(cap_b, 1, st0[1]),
                        jnp.where(cap_b, (s_ar[0:1] > 0.5).astype(
                            jnp.int32), st0[2]),
                        jnp.where(cap_b, s_wstar.astype(jnp.int32),
                                  st0[3]),
                        jnp.where(cap_b, s_ar[1:2], st0[4]),
                        jnp.where(cap_b, s_ar[2:3], st0[5])) +
                       ((jnp.where(cap_b, s_ar[3:4], st0[6]),
                         jnp.where(cap_b, s_ar[4:5], st0[7]))
                        if lead_latch else ()))
            st = jax.lax.while_loop(w_cond, w_body, st0)
            done, found = st[1] > 0, st[2] > 0
            wstar, cdel_st, cur_delta = st[3:6]
            if lead_latch:
                # leader tail fields latched during the walk: the dense
                # [Lp, Lp] gather at wstar below is skipped in the forward
                gt_latched = jnp.concatenate([st[6], st[7]], axis=0)
        else:
            # Batched walk (small W): route ids for ALL hops plus the
            # prev/curr neighbours in one pick, then ONE [3, W*Lp] gather
            # for every hop's [is_macro, count, length]; the latch loop
            # touches only [1, Lp] rows. Values are bit-identical to the
            # per-hop walk (same one-hot columns, same contraction).
            ent = batched_route_pick(W)
            prev_l, curr_l = ent[:, :Lp], ent[:, Lp:2 * Lp]
            wl_cat = ent[:, 2 * Lp:]  # [1, W*Lp]
            next_l = wl_cat[:, :Lp]
            if banded:
                # per-hop-TIER banded window gathers: hop o's target is
                # o+1 route edges == o+1 adjacency steps from the walking
                # lane, so it lies within (o+1)*band and gathers through
                # the ``_mk_windows(o+1)`` geometry. Window width is
                # monotone in o, so hops sharing a geometry form
                # contiguous runs, and any hops whose window wouldn't
                # beat dense form a suffix gathered with one dense dot.
                # Block m of GW is bit-identical to the dense
                # ``oh_cat`` gather's block m (``gather_multi``).
                rows3 = jnp.concatenate([cn["is_macro"], count_row,
                                         cn["length"]], axis=0)
                runs = []  # [(geom, [hop, ...])]
                for o in range(W):
                    g = _mk_windows(o + 1)
                    if g is None:
                        break
                    if runs and runs[-1][0] == g:
                        runs[-1][1].append(o)
                    else:
                        runs.append((g, [o]))
                o_dense = sum(len(h) for _, h in runs)
                parts = [gather_multi(
                    rows3, [wl_cat[:, o * Lp:(o + 1) * Lp] for o in hops],
                    sg=True, window_geom=g) for g, hops in runs]
                if o_dense < W:
                    parts.append(jax.lax.stop_gradient(jnp.dot(
                        rows3, oh_cat(wl_cat[:, o_dense * Lp:]),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)))
                GW = (parts[0] if len(parts) == 1 else
                      jnp.concatenate(parts, axis=1))
            elif _ablate and ({"walk", "ohb"} & set(_ablate)):
                # profiling rig: keep the families separate so their
                # stubs attribute independently
                ohw = (cn["dummy_oh"][:, :W * Lp] if "walk" in _ablate
                       else oh_cat(wl_cat))
                GW = jax.lax.stop_gradient(jnp.dot(
                    jnp.concatenate([cn["is_macro"], count_row,
                                     cn["length"]], axis=0), ohw,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            else:
                # the walk's W hop-blocks ride the boundary gather: ONE
                # build + ONE matmul for both families (rows 6-8)
                gbw = boundary_gather(wl_cat)
                boundary_out = boundary_rows(gbw)
                GW = jax.lax.stop_gradient(gbw[6:9, 3 * Lp:])
            if wide_ops:
                found, wstar, cdel_st = walk_latch_wide(wl_cat, GW)
            else:
                st = walk0
                for o in range(W):
                    st = walk_latch(wl_cat[:, o * Lp:(o + 1) * Lp],
                                    GW[:, o * Lp:(o + 1) * Lp], *st)
                done, found, wstar, cdel_st, cur_delta = st
        if boundary_out is None and walk_saved is not None and \
                "bbnd" in _ablate:
            # census stub (replay only): boundary gather + ghost math
            # removed (values WRONG, kept finite for the Riemann solve)
            zb = jnp.zeros((1, Lp))
            boundary_out = (zb, zb, zb + 1.0, zb)
        if boundary_out is None:  # replay / early-exit / rig paths
            if gsv_saved is not None:
                # replay with saved gather values: the [6, 3Lp] boundary
                # gather result was streamed by the forward — skip the
                # build+dot here; the transpose still sinks cotangents
                # into the same gather vjp (``with_saved``)
                bnd_lhs = jnp.concatenate(
                    [cn["is_macro"], r_last, u_last, r_first, u_first,
                     sig], axis=0)
                # index rows ride the explicit args (int inputs, float0
                # cotangents): a custom_vjp bwd may not close over
                # tracers from the surrounding trace
                gbw_f = with_saved(
                    lambda lhs, a, b, c: gather_multi(lhs, [a, b, c]),
                    gsv_saved[0], bnd_lhs, adjp, adjn, mprev_t)
            else:
                gbw_f = boundary_gather()
            boundary_out = boundary_rows(gbw_f)
        bl_r, bl_u, br_r, br_u = boundary_out
        if banded:
            # leader tail fields at wstar (a walk result — unbounded):
            # latched during the walk when lead_latch (forward kernels),
            # else a dense 2-row dot; the 3 signal lookups are
            # route-adjacent -> banded
            if walk_saved is not None and "bgt" in _ablate:
                # census stub (replay only): the differentiable leader
                # gather removed — attributes its recompute + transpose
                gt = jnp.zeros((2, Lp))
            elif walk_saved is not None and gsv_saved is not None:
                # replay with saved gather values: the forward latched
                # gt during the walk and streamed it; only the vjp's
                # transpose dot survives here
                geom_w = _mk_windows(W)

                def f_gt(pv, wv):
                    return (gather_multi(pv, [wv], window_geom=geom_w)
                            if geom_w is not None
                            else gather_rows([pv], wv))
                gt = with_saved(f_gt, gsv_saved[1], jnp.concatenate(
                    [pos[:1], vel[:1]], axis=0),
                    jnp.where(found, wstar, -1))
            elif lead_latch and walk_saved is None and early_exit:
                # only the early-exit walk latches the leader fields; the
                # batched-walk wide path (step_hlo / step_cost tracing)
                # falls through to the windowed gather below
                gt = gt_latched  # bit-identical: same one-hot pick
            else:
                # wstar is a terminating hop's lane (hops 0..W-1), so it
                # lies within W*band of the column lane: gather through
                # the W-step window geometry when it beats dense (this is
                # the DIFFERENTIABLE leader gather — gather_multi without
                # sg — incl. on the backward-replay path)
                geom_w = _mk_windows(W)
                wstar_v = jnp.where(found, wstar, -1)
                if geom_w is not None:
                    gt = gather_multi(
                        jnp.concatenate([pos[:1], vel[:1]], axis=0),
                        [wstar_v], window_geom=geom_w)
                else:
                    gt = gather_rows([pos[:1], vel[:1]], wstar_v)
            if walk_saved is not None and "bgt" in _ablate:
                # census stub (replay only): the 3 sig gathers removed
                sig_c = sig_p = sig_n = jnp.zeros((1, Lp))
            elif walk_saved is not None and gsv_saved is not None:
                # replay with saved gather values: three separate
                # with_saved calls (not one sliced wide row) so each
                # cotangent sinks into its own dot transpose — the
                # sliced-wide form transposes to mixed-offset lane pads
                # Mosaic rejects (Pallas lessons)
                f_s1 = lambda s, ix: gather_multi(s, [ix])  # noqa: E731
                sig_c = with_saved(f_s1, gsv_saved[2][:, :Lp], sig,
                                   curr_l)
                sig_p = with_saved(f_s1, gsv_saved[2][:, Lp:2 * Lp], sig,
                                   prev_l)
                sig_n = with_saved(f_s1, gsv_saved[2][:, 2 * Lp:], sig,
                                   next_l)
            elif walk_saved is not None and wide_ops:
                # replay (in-kernel vjp): lane-slicing a DIFFERENTIABLE
                # [1, 3Lp] gather transposes to a lane pad, and the wide
                # path's stacked-row consumers hand that pad cotangents
                # at nonzero sublane offsets — an illegal mixed-offset
                # tpu.concatenate on Mosaic. Three M=1 gathers route each
                # cotangent straight into a dot transpose (dots relayout
                # their operands freely). Same one-hot columns, same
                # contractions: bit-identical.
                sig_c = gather_multi(sig, [curr_l])
                sig_p = gather_multi(sig, [prev_l])
                sig_n = gather_multi(sig, [next_l])
            else:
                if GUm is not None:
                    # blocks 1/2/0 of the merged forward gather (row 9 =
                    # sig) — bit-identical to the dedicated sig3 gather
                    sig_c = GUm[9:10, Lp:2 * Lp]
                    sig_p = GUm[9:10, 2 * Lp:3 * Lp]
                    sig_n = GUm[9:10, :Lp]
                else:
                    sig3 = gather_multi(sig, [curr_l, prev_l, next_l])
                    sig_c, sig_p, sig_n = (sig3[:, :Lp],
                                           sig3[:, Lp:2 * Lp],
                                           sig3[:, 2 * Lp:])
        elif walk_saved is not None and wide_ops:
            # replay: curr_l/next_l are lane-block SLICES of the wide
            # [1, 5Lp] ids residual and carry lane offsets (Lp, 2Lp) —
            # real Mosaic rejects broadcasting an offset [1, Lp] row to
            # [Lp, Lp] ("Invalid input layout" on vector.broadcast),
            # which is exactly what a per-index oh_l build does.
            # Concatenating the four index rows FIRST yields a fresh
            # offset-0 [1, 4Lp] row whose single iota-compare broadcast
            # is legal; the BLOCKS of that one wide one-hot then feed
            # four separate M=1 dots (a sliced one-hot is a dot RHS —
            # dots relayout their operands freely), so each
            # differentiable cotangent still sinks into its own dot
            # transpose rather than a lane pad. Same one-hot columns,
            # same contractions: bit-identical to per-index gathers.
            oh4w = oh_multi([jnp.where(found, wstar, -1), curr_l,
                             prev_l, next_l])
            gt = gather_rows([pos[:1], vel[:1]], None,
                             oh=oh4w[:, :Lp])
            sig_c = gather_rows([sig], None, oh=oh4w[:, Lp:2 * Lp])
            sig_p = gather_rows([sig], None, oh=oh4w[:, 2 * Lp:3 * Lp])
            sig_n = gather_rows([sig], None, oh=oh4w[:, 3 * Lp:])
        else:
            # leader tail fields + the 3 signal lookups in ONE wide gather
            ohg = (cn["dummy_oh"][:, :4 * Lp] if "ohg" in _ablate else
                   oh_multi([jnp.where(found, wstar, -1), curr_l, prev_l,
                             next_l]))  # [Lp, 4Lp]
            gts = jnp.dot(jnp.concatenate([pos[:1], vel[:1], sig],
                                          axis=0),
                          ohg, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            gt = gts[0:2, :Lp]
            sig_c, sig_p, sig_n = (gts[2:3, Lp:2 * Lp],
                                   gts[2:3, 2 * Lp:3 * Lp],
                                   gts[2:3, 3 * Lp:])
        cdel = cdel_st + (base - jax.lax.stop_gradient(base))
        new_pd = jnp.maximum(cdel + gt[0:1] - veh_len * 0.5, 0.0)
        pd_g = jnp.where(found, new_pd, 1000.0)
        sd_g = jnp.where(found, hv_vel - gt[1:2], 0.0)

        # ---- micro signal blending (env boundary_and_step)
        red_pd = jnp.maximum(cn["length"] - hv_pos - veh_len * 0.5, 0.0)
        prev_exist = prev_l >= 0
        next_exist = next_l >= 0
        if diff and wide_ops:
            # the four blending sigmoids share (x, c) structure: one
            # stacked chain instead of four narrow ones (bit-exact:
            # elementwise on the same values)
            s4 = soft(jnp.concatenate(
                [-hv_pos, hv_pos, cn["length"] - hv_pos,
                 hv_pos - cn["length"]], axis=0), 16.0)
            zero_r = jnp.zeros((1, Lp))
            p_sc = jnp.where(prev_exist, stg(zero_r, s4[0:1]), 0.0)
            c_sc = stg(jnp.ones((1, Lp)), s4[1:2] * s4[2:3])
            n_sc = jnp.where(next_exist, stg(zero_r, s4[3:4]), 0.0)
        elif diff:
            zero_r = jnp.zeros((1, Lp))
            p_sc = jnp.where(prev_exist, stg(zero_r, soft(-hv_pos, 16.0)),
                             0.0)
            c_sc = stg(jnp.ones((1, Lp)),
                       soft(hv_pos, 16.0) * soft(cn["length"] - hv_pos,
                                                 16.0))
            n_sc = jnp.where(next_exist,
                             stg(zero_r, soft(hv_pos - cn["length"], 16.0)),
                             0.0)
        else:
            p_sc = jnp.zeros((1, Lp))
            c_sc = jnp.ones((1, Lp))
            n_sc = jnp.zeros((1, Lp))
        ssum = p_sc + c_sc + n_sc
        p_sc, c_sc, n_sc = p_sc / ssum, c_sc / ssum, n_sc / ssum
        # the 3 sig lookups ride the signal gather above
        fsig = c_sc * sig_c
        fsig += jnp.where(prev_exist, p_sc * sig_p, 0.0)
        fsig += jnp.where(next_exist, n_sc * sig_n, 0.0)
        blend = h_exists & (micro_row > 0)
        if diff:
            sg_tot = sg_tot + jax.lax.stop_gradient(
                ep_sum(fsig * blend.astype(jnp.float32), cn))
            sg_cnt = sg_cnt + ep_sum(blend.astype(jnp.float32), cn)
            c_sig = ep_spread(32.0 * gsc / jnp.maximum(
                jnp.abs(sg_tot / jnp.maximum(sg_cnt, 1.0)), 1e-6), cn)
            fs = stg(fsig >= 0.5, soft(fsig - 0.5, c_sig))
            pd = pd_g * fs + red_pd * (1.0 - fs)
            sd = sd_g * fs
        else:
            green = fsig >= 0.5
            pd = jnp.where(green, pd_g, red_pd)
            sd = jnp.where(green, sd_g, 0.0)
        pd = jnp.where(blend, pd, pd_g)
        sd = jnp.where(blend, sd, sd_g)

        # ---- godunov on macro rows
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
        if "riemann" in _ablate:  # profiling stub: linear upwind flux
            max_wave = jnp.max(jnp.abs(ul) * cn["is_macro"])
            fr = rl * ul
            fy = yl * ul
        else:
            sol = arz.riemann_solve(rl, yl, ul, rr_, ur_, u_max)
            # CFL diagnostic, same plateau-masked definition as the scan
            # path (godunov_step max over interfaces; micro excluded)
            max_wave = jnp.max(jnp.maximum(
                jnp.abs(sol.speed0), jnp.abs(sol.speed1)) * cn["is_macro"])
            fr = sol.r0 * sol.u0
            fy = sol.y0 * sol.u0
        new_r = jnp.where(cn["cmask"] > 0, r + (fr[:-1] - fr[1:]) * cn["coef"],
                          r)
        new_y = jnp.where(cn["cmask"] > 0, y + (fy[:-1] - fy[1:]) * cn["coef"],
                          y)
        r, y = new_r, new_y

        # ---- micro IDM step (vehicle axis 0, like the micro kernel)
        lead_pos = jnp.concatenate([pos[1:], jnp.zeros((1, Lp))], axis=0)
        lead_vel = jnp.concatenate([vel[1:], jnp.zeros((1, Lp))], axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Vp, Lp), 0)
        active = rows < count
        is_head = rows == (count - 1)
        gap = jnp.abs(lead_pos - pos) - veh_len
        dv = vel - lead_vel
        gap = jnp.where(is_head, pd, gap)
        dv = jnp.where(is_head, sd, dv)
        coll = gap < 0.0
        gap = jnp.maximum(jnp.where(coll, 0.0, gap), idm.POSITION_DELTA_EPS)
        dv = jnp.where(coll, 0.0, dv)
        if "idm" in _ablate:  # profiling stub: constant relaxation
            acc = jnp.where(active, -0.1 * dv + 0.01 * gap, 0.0)
        else:
            res = idm.idm_acceleration(
                dflt["accel_max"], dflt["accel_pref"], vel,
                dflt["target_speed"], gap, dv, dflt["min_space"],
                dflt["time_pref"], dt)
            acc = jnp.where(active, res.acceleration, 0.0)
        pos = jnp.where(active, pos + dt * vel, pos)
        vel = jnp.where(active, vel + dt * acc, vel)

        # ---- conversion -------------------------------------------------
        u = arz.compute_u(r, y, u_max)
        r_last = jnp.sum(r * cn["last_pick"], axis=0, keepdims=True)
        u_last = jnp.sum(u * cn["last_pick"], axis=0, keepdims=True)
        macro_src = (cn["is_macro"] > 0) & (mnext_t >= 0)
        # head state after the IDM step (route/ridx are untouched by IDM,
        # so the pre-walk route_h/ridx_h rows still hold — and hnext is
        # the walk's next_l entry)
        ohv_h = head_oh(count)
        hv_pos = pick_v(pos, ohv_h)
        hv_vel = pick_v(vel, ohv_h)
        hv_a = pick_v(av, ohv_h)
        h_exists = count > 0
        hnext = next_l
        if conv_saved is None and "conv" in _ablate:
            # census stub: destination probes + K-way arbitration removed
            # (values WRONG; attributes the conversion-decision family)
            false_r = jnp.zeros((1, Lp), jnp.bool_)
            next_is_micro = exit_none = false_r
            want_emit = want_tr = want_dep = false_r
            best = jnp.full((1, Lp), Lp, jnp.int32)
            dep_best = jnp.full((1, Lp), Lp, jnp.int32)
        elif conv_saved is not None:
            # backward replay: the conversion section's discrete outcomes
            # (arbitration winners + event/win flags) were saved per step
            # by the forward, so the two stop-gradient probe gathers (gmh
            # at [mnext, hnext], GK at the K predecessor lists) and the
            # predicate/arbitration chain are skipped entirely — they
            # carry no gradient and replay deterministically. Requires
            # head_saved (the route-pool picks reference full-Gall rows).
            # arbitration winners ride the wide ids residual (blocks 3-4)
            # so the [sdep, src] gather's index concat sees offset-0 rows
            best = ids_saved[:, 3 * Lp:4 * Lp]
            dep_best = ids_saved[:, 4 * Lp:5 * Lp]
            next_is_micro = conv_saved[0:1] > 0
            emit_win = conv_saved[1:2] > 0
            tr_win = conv_saved[2:3] > 0
            dep_win = conv_saved[3:4] > 0
            exit_none = conv_saved[4:5] > 0
        else:
            # destination probes for BOTH event families (macro->micro
            # emission at mnext, head exits at hnext) in ONE gather; every
            # row only feeds event PREDICATES -> stop-gradient
            if GUm is not None:
                # destination probes from the merged forward gather: the
                # merged call ran PRE-IDM, so the post-IDM tail position
                # is recomputed from its pos/vel rows with the exact IDM
                # update (where(count>0, pos + dt*vel, pos)) — the same
                # f32 ops on the same values, bit-identical; hnext ==
                # next_l rides block 0
                ohmh = None
                gmh = None
                b6 = slice(6 * Lp, 7 * Lp)
                gm_rows = (GUm[0:1, b6], GUm[1:2, b6],
                           jnp.where(GUm[1:2, b6] > 0.0,
                                     GUm[3:4, b6] + dt * GUm[4:5, b6],
                                     GUm[3:4, b6]),
                           GUm[2:3, b6])
                hn_mac_row = GUm[0:1, :Lp]
                hn_cnt_row = GUm[1:2, :Lp]
                next_is_micro = macro_src & (gm_rows[0] < 0.5)
            elif banded:
                ohmh = None
                gmh = gather_multi(jnp.concatenate(
                    [cn["is_macro"], count_row, pos[:1], cn["length"]],
                    axis=0), [mnext_t, hnext], sg=True)
            else:
                gmh_rows = jnp.concatenate(
                    [cn["is_macro"], count_row, pos[:1], cn["length"]],
                    axis=0)
                ohmh = (cn["dummy_oh"][:, :2 * Lp] if "ohmh" in _ablate else
                        oh_multi([mnext_t, hnext]))
                gmh = jax.lax.stop_gradient(jnp.dot(
                    gmh_rows, ohmh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            if GUm is None:
                gm_rows = (gmh[0:1, :Lp], gmh[1:2, :Lp], gmh[2:3, :Lp],
                           gmh[3:4, :Lp])
                hn_mac_row = gmh[0:1, Lp:]
                hn_cnt_row = gmh[1:2, Lp:]
                next_is_micro = macro_src & (gm_rows[0] < 0.5)
        inc = jnp.where(next_is_micro, r_last * u_last * dt, 0.0)
        slot_oh = ((cn["next_k"] == mnext_t) &
                   (cn["next_k"] >= 0)).astype(jnp.float32)  # [K, Lp]
        # first matching slot only (ids unique per lane's list)
        cap = cap + slot_oh * inc
        cap_val = jnp.sum(cap * slot_oh, axis=0, keepdims=True)

        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
        if conv_saved is None and "conv" not in _ablate:
            dest_count = gm_rows[1]
            free_n = jnp.where(dest_count > 0.5,
                               gm_rows[2] - 0.5 * veh_len, gm_rows[3])
            want_emit = (next_is_micro &
                         (jax.lax.stop_gradient(cap_val) >= veh_len) &
                         (free_n >= veh_len) & (dest_count < V))

            past_end = h_exists & (hv_pos >= cn["length"])
            hn_macro = (hnext >= 0) & (hn_mac_row > 0.5)
            hn_micro = (hnext >= 0) & ~hn_macro
            exit_none = past_end & (hnext < 0)
            want_tr = past_end & hn_micro & (hn_cnt_row < V)
            want_dep = h_exists & hn_macro & (hv_pos >
                                              cn["length"] + veh_len)

            # arbitration over each dest's predecessor list: the 4
            # candidate rows gathered at ALL K static predecessor lists
            # in one matmul
            mnext_f = mnext_t.astype(jnp.float32)
            tr_tgt = jnp.where(want_tr, hnext, -2).astype(jnp.float32)
            dep_tgt = jnp.where(want_dep, hnext, -2).astype(jnp.float32)
            we_f = want_emit.astype(jnp.float32)
            gk_rows = jnp.concatenate([mnext_f, we_f, tr_tgt, dep_tgt],
                                      axis=0)
            if banded:
                GK = gather_multi(gk_rows, None, sg=True,
                                  prebuilt_chunks=cn["ohpk_b"])
            else:
                ohpk = (cn["dummy_oh"][:, :K * Lp] if "ohpk" in _ablate else
                        (cn["ohpk_c"] if hoist_ohpk else
                         oh_cat(cn["prev_cat"])))
                GK = jax.lax.stop_gradient(jnp.dot(
                    gk_rows, ohpk, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            if wide_ops:
                # all K predecessor slots tested at once on the wide GK
                # rows; the winner (lowest predecessor id) is an exact
                # int block-min, identical to the sequential K-fold
                okw = cn["prev_cat"] >= 0  # invalid slots gather zeros
                lane_tile = jnp.concatenate([lane_ids] * K, axis=1)
                tgtw = GK[0:1].astype(jnp.int32)
                c_emitw = okw & (GK[1:2] > 0.5) & (tgtw == lane_tile)
                c_trw = okw & (GK[2:3].astype(jnp.int32) == lane_tile)
                best = blk_tree(jnp.where(c_emitw | c_trw,
                                          cn["prev_cat"], Lp),
                                jnp.minimum, K)
                c_depw = okw & (GK[3:4].astype(jnp.int32) == lane_tile)
                dep_best = blk_tree(jnp.where(c_depw, cn["prev_cat"], Lp),
                                    jnp.minimum, K)
            else:
                best = jnp.full((1, Lp), Lp, jnp.int32)
                dep_best = jnp.full((1, Lp), Lp, jnp.int32)
                for k in range(K):
                    pk = cn["prev_k"][k: k + 1]  # [1, Lp]
                    ok = pk >= 0  # every candidate test below is gated on
                    # ok, so the zeros a batched gather yields at invalid
                    # pk are harmless
                    gk = GK[:, k * Lp:(k + 1) * Lp]
                    tgt = gk[0:1].astype(jnp.int32)
                    c_emit = ok & (gk[1:2] > 0.5) & (tgt == lane_ids)
                    c_tr = ok & (gk[2:3].astype(jnp.int32) == lane_ids)
                    cand = jnp.where(c_emit | c_tr, pk, Lp)
                    best = jnp.minimum(best, cand)
                    cand_d = jnp.where(ok & (gk[3:4].astype(jnp.int32) ==
                                             lane_ids), pk, Lp)
                    dep_best = jnp.minimum(dep_best, cand_d)

        # the emitted vehicle's ancillary mass: value veh_len, gradient of
        # the source lane's flux capacitor (the reference's nv.a trick,
        # conversion.py:62; scan model dmath.grad_carrier). The one-hot
        # gather is exact, so the value stays exactly veh_len while the
        # matmul transpose routes the cotangent back into cap.
        emit_carrier = veh_len + cap_val - jax.lax.stop_gradient(cap_val)
        has_ins = best < Lp
        src = jnp.clip(best, 0, Lp - 1)
        dep_has = dep_best < Lp
        sdep = jnp.clip(dep_best, 0, Lp - 1)
        # EVERY post-arbitration gather (win verdicts at mnext/hnext,
        # deposit fields at sdep, insert fields at src) through ONE
        # [Lp, 4Lp] one-hot: a stop-grad matmul for the discrete rows
        # (verdicts, lengths, cursor, the R route id rows — their
        # cotangent chains terminate at constants or ints) and one
        # differentiable matmul for the float state rows
        # blocks 1-2 (mnext, hnext) are bit-identical to ``ohmh`` above, so
        # reuse it and build only the [sdep, src] half (lane-axis concat of
        # two sublane-offset-0 values — Mosaic-safe, unlike slice concats)
        if conv_saved is None and "conv" in _ablate:
            # census stub: post-arbitration gathers removed (values WRONG)
            Gsg = jnp.zeros((2, 2 * Lp))
            Gdf_dep = jnp.zeros((5, Lp))
            Gdf_src = jnp.zeros((5, Lp))
            b_dep, b_src = slice(0, Lp), slice(Lp, 2 * Lp)
            i_mac, i_len = 0, 1
            emit_win = tr_win = dep_win = jnp.zeros((1, Lp), jnp.bool_)
        elif conv_saved is not None:
            # reduced replay gather: the verdict blocks (mnext/hnext) are
            # replaced by the saved win flags and the discrete rows (ids,
            # ridx, the R route-id rows) are dead under head_saved, so
            # only [is_macro, length | float state] at [sdep, src] remain
            # — 7 rows x [Lp, 2Lp] instead of (10+R) x [Lp, 4Lp]
            gsg_rows = jnp.concatenate([cn["is_macro"], cn["length"]],
                                       axis=0)
            gdf_rows = jnp.concatenate(
                [hv_pos, hv_vel, hv_a, u_last, emit_carrier], axis=0)
            # the sg rows stay one wide gather (no transpose), but the
            # DIFFERENTIABLE rows gather per index: lane-slicing a wide
            # diff tensor transposes to a lane pad whose mixed-offset
            # cotangents Mosaic cannot concatenate (the replay runs
            # inside the backward kernel's in-kernel vjp)
            if "bconv" in _ablate:
                # census stub (replay only): post-arbitration gathers
                # removed (values WRONG)
                Gsg = jnp.zeros((2, 2 * Lp))
                Gdf_dep = jnp.zeros((5, Lp))
                Gdf_src = jnp.zeros((5, Lp))
            elif banded and gsv_saved is not None:
                # replay with saved gather values: the sg rows come from
                # the stream too (forward Gall rows [is_macro, length]
                # at blocks [sdep | src] — same one-hot columns), the
                # differentiable [5, Lp] blocks ride with_saved
                Gsg = gsv_saved[4]
                f_g1 = lambda g, ix: gather_multi(g, [ix])  # noqa: E731
                Gdf_dep = with_saved(f_g1, gsv_saved[3][:, :Lp],
                                     gdf_rows, sdep)
                Gdf_src = with_saved(f_g1, gsv_saved[3][:, Lp:],
                                     gdf_rows, src)
            elif banded:
                Gsg = gather_multi(gsg_rows, [sdep, src], sg=True)
                Gdf_dep = gather_multi(gdf_rows, [sdep])
                Gdf_src = gather_multi(gdf_rows, [src])
            else:
                # sdep/src derive elementwise from lane-offset slices of
                # the wide ids residual (blocks 3-4), so per-index oh_l
                # broadcasts are Mosaic-illegal here too (see the sig
                # replay gathers above): build ONE one-hot from the
                # fresh [sdep, src] concat and slice its blocks as the
                # two M=1 dot RHSs — bit-identical, offsets erased.
                ohds = oh_multi([sdep, src])
                Gsg = jax.lax.stop_gradient(jnp.dot(
                    gsg_rows, ohds,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
                Gdf_dep = gather_rows([gdf_rows], None, oh=ohds[:, :Lp])
                Gdf_src = gather_rows([gdf_rows], None, oh=ohds[:, Lp:])
            b_dep, b_src = slice(0, Lp), slice(Lp, 2 * Lp)
            i_mac, i_len = 0, 1
        else:
            oh4 = None if banded else (
                cn["dummy_oh"][:, :4 * Lp] if "oh4" in _ablate else
                jnp.concatenate([ohmh, oh_multi([sdep, src])], axis=1))
            # ONE matmul for both row families; the discrete rows' slice
            # is stop-gradient'd AFTER the dot (their cotangent is
            # structurally zero, so the merged transpose routes the same
            # gradient as the former two-dot form — and one dot replaces
            # two)
            n_sg = 5 + R
            gall_rows = jnp.concatenate(
                [best.astype(jnp.float32),
                 dep_best.astype(jnp.float32), cn["is_macro"],
                 cn["length"], ridx_h.astype(jnp.float32),
                 route_h.astype(jnp.float32),
                 hv_pos, hv_vel, hv_a, u_last, emit_carrier], axis=0)
            if banded:
                Gall = gather_multi(gall_rows, [mnext_t, hnext, sdep, src])
            else:
                Gall = jnp.dot(
                    gall_rows, oh4, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            Gsg = jax.lax.stop_gradient(Gall[:n_sg])
            Gdf = Gall[n_sg:]
            b_mn, b_hn = slice(0, Lp), slice(Lp, 2 * Lp)
            b_dep, b_src = slice(2 * Lp, 3 * Lp), slice(3 * Lp, 4 * Lp)
            emit_win = want_emit & (Gsg[0:1, b_mn].astype(jnp.int32) ==
                                    lane_ids)
            tr_win = want_tr & (Gsg[0:1, b_hn].astype(jnp.int32) ==
                                lane_ids)
            dep_win = want_dep & (Gsg[1:2, b_hn].astype(jnp.int32) ==
                                  lane_ids)
            i_mac, i_len = 2, 3
            # forward kernel (no vjp): plain lane-slice views
            Gdf_dep, Gdf_src = Gdf[:, b_dep], Gdf[:, b_src]

        # removals
        remove = exit_none | dep_win | tr_win
        count = count - remove.astype(jnp.int32)
        # capacitor decrement (detached), only the routed slot
        cap_dec = jnp.where(emit_win,
                            jax.lax.stop_gradient(cap_val - veh_len),
                            cap_val)
        cap = cap * (1.0 - slot_oh) + slot_oh * cap_dec

        # inserts: all per-src fields ride the ``b_src`` block
        src_is_macro = Gsg[i_mac:i_mac + 1, b_src] > 0.5
        is_emit_d = has_ins & src_is_macro
        new_pos_d = jnp.where(is_emit_d, 0.0,
                              Gdf_src[0:1] - Gsg[i_len:i_len + 1, b_src])
        new_vel_d = jnp.where(is_emit_d, Gdf_src[3:4], Gdf_src[1:2])
        new_a_d = jnp.where(is_emit_d, Gdf_src[4:5], Gdf_src[2:3])

        hm = has_ins
        pos = tail_insert(pos, new_pos_d[0], hm)
        vel = tail_insert(vel, new_vel_d[0], hm)
        av = tail_insert(av, new_a_d[0], hm)
        if head_saved is None and "croute" not in _ablate and \
                "conv" not in _ablate:
            # route: emission pops dest pool; transfer carries src head
            # route (rows 4:5+ of the full Gall — only built when the
            # route containers are actually updated)
            ohc = ((jax.lax.broadcasted_iota(jnp.int32, (P_emit, 1, Lp), 0)
                    == (cursor % P_emit)[None]).astype(jnp.float32))
            pool_route = jnp.sum(emit_routes.astype(jnp.float32) * ohc,
                                 axis=0)  # [R, Lp]
            src_route = Gsg[5:, b_src]  # [R, Lp]
            new_route_d = jnp.where(is_emit_d, pool_route,
                                    src_route).astype(jnp.int32)
            new_ridx_d = jnp.where(
                is_emit_d, 0, Gsg[4:5, b_src].astype(jnp.int32) + 1).astype(
                jnp.int32)
            route = jnp.where(hm[None], jnp.concatenate(
                [new_route_d[None], route[:-1]], axis=0), route)
            ridx = tail_insert(ridx, new_ridx_d[0], hm)
        count = count + hm.astype(jnp.int32)
        cursor = cursor + is_emit_d.astype(jnp.int32)

        # micro -> macro deposits (fields ride the ``b_dep`` block)
        v_head = Gdf_dep[0:1] - Gsg[i_len:i_len + 1, b_dep]
        v_tail = v_head - veh_len
        # Mosaic requires integer iota; cast after
        cells = jax.lax.broadcasted_iota(jnp.int32, (Cp, Lp), 0).astype(
            jnp.float32)
        c_tail = cells * cn["cell_len"]
        c_head = (cells + 1.0) * cn["cell_len"]
        ov = ((c_head > v_tail) & (c_tail < v_head) & (cn["cmask"] > 0) &
              dep_has & (cn["cell_len"] > v_tail))
        max_head = jnp.maximum(c_head, v_head)
        min_tail = jnp.minimum(c_tail, v_tail)
        overlap = cn["cell_len"] + veh_len - (max_head - min_tail)
        add_r = (Gdf_dep[2:3] / veh_len * (overlap / cn["cell_len"]))
        n_r = r + add_r
        n_r = n_r - jax.lax.stop_gradient(n_r - jnp.clip(n_r, 1e-5,
                                                         1.0 - 1e-5))
        dep_u = Gdf_dep[1:2]
        r = jnp.where(ov, n_r, r)
        y = jnp.where(ov, arz.compute_y(n_r, dep_u, u_max), y)

        # ---- queue reward
        u_cells = arz.compute_u(r, y, u_max)
        if packed:
            # per-episode sums (lane -> episode one-hot matmuls); reduce
            # the cell/vehicle axis first so the matmul LHS is [1, Lp]
            ss_tot = ss_tot + jax.lax.stop_gradient(ep_sum(jnp.sum(
                (static_speed - u_cells) * cn["cmask"], axis=0,
                keepdims=True), cn))
            ss_cnt = ss_cnt + ep_sum(
                jnp.sum(cn["cmask"], axis=0, keepdims=True), cn)
        else:
            ss_tot = ss_tot + jax.lax.stop_gradient(
                jnp.sum((static_speed - u_cells) * cn["cmask"]))
            ss_cnt = ss_cnt + jnp.sum(cn["cmask"])
        rows = jax.lax.broadcasted_iota(jnp.int32, (Vp, Lp), 0)
        veh_m = ((rows < count) & (micro_row > 0)).astype(jnp.float32)
        if packed:
            ss_tot = ss_tot + jax.lax.stop_gradient(ep_sum(jnp.sum(
                (static_speed - vel) * veh_m, axis=0, keepdims=True), cn))
            ss_cnt = ss_cnt + ep_sum(
                jnp.sum(veh_m, axis=0, keepdims=True), cn)
        else:
            ss_tot = ss_tot + jax.lax.stop_gradient(
                jnp.sum((static_speed - vel) * veh_m))
            ss_cnt = ss_cnt + jnp.sum(veh_m)
        if diff:
            c_st = ep_spread(16.0 / jnp.maximum(
                jnp.abs(ss_tot / jnp.maximum(ss_cnt, 1.0)), 1e-6), cn)
        if wide_ops:
            # one stacked threshold chain + ONE masked reduce: per lane
            # exactly one of the two weight halves is nonzero (cmask is
            # macro-only, veh_m micro-only), and adding exact 0.0 rows
            # leaves the other half's sum bit-identical to the separate
            # reduces + where-select
            x_all = static_speed - jnp.concatenate([u_cells, vel], axis=0)
            s_all = stg(x_all > 0, soft(x_all, c_st)) if diff else \
                (x_all > 0).astype(jnp.float32)
            w_all = jnp.concatenate(
                [(r * cn["cell_len"] / veh_len) * cn["cmask"], veh_m],
                axis=0)
            q_lane = jnp.sum(s_all * w_all, axis=0, keepdims=True)
        else:
            if diff:
                stat_c = stg(u_cells < static_speed,
                             soft(static_speed - u_cells, c_st))
                stat_v = stg(vel < static_speed,
                             soft(static_speed - vel, c_st))
            else:
                stat_c = (u_cells < static_speed).astype(jnp.float32)
                stat_v = (vel < static_speed).astype(jnp.float32)
            q_macro = jnp.sum(stat_c * (r * cn["cell_len"] / veh_len) *
                              cn["cmask"], axis=0, keepdims=True)
            q_micro = jnp.sum(stat_v * veh_m, axis=0, keepdims=True)
            q_lane = jnp.where(cn["is_macro"] > 0, q_macro, q_micro)
        queue = ep_sum(q_lane * q_lane * cn["lane_mask"], cn) * dt

        carry = (r, y, pos, vel, av, count, route, ridx, cap, inj_left,
                 cursor, ss_tot, ss_cnt, sg_tot, sg_cnt)
        if wide_ops:
            # the 7 event counters reduce in ONE [7, Lp] sum (exact: 0/1
            # addends) instead of 7 scalar reductions
            # cast each mask BEFORE the concat: Mosaic cannot concatenate
            # i1 vectors (invalid tpu.bitcast_vreg i1->i32 on real TPU;
            # interpret mode accepts it)
            evm = jnp.concatenate(
                [m.astype(jnp.float32) for m in
                 (im, is_emit_d, exit_none | dep_win,
                  has_ins & ~src_is_macro, tr_win, dep_win, remove)],
                axis=0)
            ev = jnp.concatenate(
                [jnp.sum(evm, axis=1, keepdims=True),
                 jax.lax.stop_gradient(max_wave).reshape(1, 1)],
                axis=0).reshape(1, 8)
        else:
            f32sum = lambda m: jnp.sum(m.astype(jnp.float32))
            ev = jnp.stack([f32sum(im), f32sum(is_emit_d),
                            f32sum(exit_none | dep_win),
                            f32sum(has_ins & ~src_is_macro), f32sum(tr_win),
                            f32sum(dep_win), f32sum(remove),
                            jax.lax.stop_gradient(max_wave)]).reshape(1, 8)
        if route_h is None:  # replay: residuals are inputs, not outputs
            return carry, queue, ev, ()
        if wide_ops:
            # walk outcome rows (axis-0 stack, offsets tolerated), the 5
            # index rows as ONE wide [1, 5Lp] lane-concat (every operand
            # is a fresh offset-0 row here, and the replay's lane-block
            # slices stay offset-0 — Mosaic's index-concat requirement),
            # and the conversion win flags in a third stack. The backward
            # replays all of it and never reads route_h/ridx_h (whose
            # [R+1, Lp] per-step residual stream is dropped entirely).
            walk_i = jnp.concatenate(
                [found.astype(jnp.int32), wstar], axis=0)
            ids_w = jnp.concatenate(
                [prev_l, curr_l, next_l, best, dep_best], axis=1)
            conv_i = jnp.concatenate(
                [next_is_micro.astype(jnp.int32),
                 emit_win.astype(jnp.int32), tr_win.astype(jnp.int32),
                 dep_win.astype(jnp.int32), exit_none.astype(jnp.int32),
                 im.astype(jnp.int32)], axis=0)
            extra = (walk_i, cdel_st, ids_w, conv_i)
            if save_gathers:
                # the replay's differentiable gather values, streamed for
                # ``with_saved`` (each bit-identical to the replay's own
                # recompute — the already-pinned invariant)
                # Gsg rows [is_macro, length] at blocks [sdep | src]
                # (the census "conv" stub leaves a [2, 2Lp] Gsg with no
                # sdep/src blocks — pack zeros there, values moot)
                extra += (gbw_f, gt, sig3, Gdf[:, 2 * Lp:],
                          (Gsg[i_mac:i_len + 1, 2 * Lp:]
                           if Gsg.shape[1] >= 4 * Lp
                           else jnp.zeros((2, 2 * Lp))))
        else:
            walk_i = jnp.concatenate([found.astype(jnp.int32), wstar],
                                     axis=0)
            extra = (walk_i, cdel_st, route_h.astype(jnp.int32), ridx_h)
        return carry, queue, ev, extra

    # =====================================================================
    # Carry layout for grid streaming. Order matches the ``step`` carry
    # tuple, with the 4 trailing RMS scalars packed into one (1, 4) row.
    TRAJ = (("r", (Cp, Lp), jnp.float32),
            ("y", (Cp, Lp), jnp.float32),
            ("pos", (Vp, Lp), jnp.float32),
            ("vel", (Vp, Lp), jnp.float32),
            ("av", (Vp, Lp), jnp.float32),
            ("count", (1, Lp), jnp.int32),
            ("route", (Vp, R, Lp), jnp.int32),
            ("ridx", (Vp, Lp), jnp.int32),
            ("cap", (K, Lp), jnp.float32),
            ("inj_left", (1, Lp), jnp.int32),
            ("cursor", (1, Lp), jnp.int32),
            ("rms", (4, Bp) if packed else (1, 4), jnp.float32))
    NT = len(TRAJ)
    NSTATE = NT - 1  # carry comps before the packed rms row
    # differentiated comps: r, y, pos, vel, av (the ancillary gradient
    # carrier), cap (flux capacitor) and the rms row. Int containers carry
    # no cotangent (their float uses are comparisons / one-hot
    # construction).
    FDIFF = (0, 1, 2, 3, 4, 8, 11)
    n_const = len(const_names)

    # Residual streaming: the backward touches the [Vp, R, Lp] route
    # container and the [Vp, Lp] route-index plane only through the head
    # rows, which the forward saves per step instead (EXTRA blocks) — the
    # "slim" stream drops both planes: ~6x less residual HBM traffic at
    # 3x3, and the per-step streamed block shrinks 64x at 9x9.
    # ``debug_forward`` still streams the full carry ("full" mode) for the
    # state-parity tests.
    SLIM_IDX = tuple(j for j, (n, _, _) in enumerate(TRAJ)
                     if n not in ("route", "ridx"))
    FULL_IDX = tuple(range(NT))
    # step-computed residuals appended after the carry blocks: the walk's
    # terminating state and the head vehicle's route row / route index
    if wide_ops:
        # walk outcome + head prev/curr/next route ids, then the discrete
        # conversion outcomes (arbitration winners + win flags): the
        # backward replays these and skips the route picks, the gmh/GK
        # probe gathers and the predicate chain — and the route_h/ridx_h
        # planes are not streamed at all
        EXTRA = (("walk_i", (2, Lp), jnp.int32),
                 ("walk_f", (1, Lp), jnp.float32),
                 ("ids_w", (1, 5 * Lp), jnp.int32),
                 ("conv_i", (6, Lp), jnp.int32))
        if save_gathers:
            # the replay's differentiable gather VALUES (see
            # ``with_saved``): boundary gather [6 rows x 3 idx blocks],
            # leader tail pos/vel at wstar, the 3 sig lookups
            # [curr|prev|next], and the post-arbitration float rows at
            # [sdep|src] — ~210 KB/step at 9x9, bought back as the
            # replay skipping every gather build+dot on its forward pass
            EXTRA += (("gbw_s", (6, 3 * Lp), jnp.float32),
                      ("gt_s", (2, Lp), jnp.float32),
                      ("sig3_s", (1, 3 * Lp), jnp.float32),
                      ("gdf_s", (5, 2 * Lp), jnp.float32),
                      ("gsg_s", (2, 2 * Lp), jnp.float32))
    else:
        EXTRA = (("walk_i", (2, Lp), jnp.int32),
                 ("walk_f", (1, Lp), jnp.float32),
                 ("route_h", (R, Lp), jnp.int32),
                 ("ridx_h", (1, Lp), jnp.int32))
    NEXTRA = len(EXTRA)

    def pack(carry):
        comps = list(carry[:NSTATE])
        if packed:
            comps.append(jnp.concatenate(carry[NSTATE:], axis=0))  # (4, Bp)
        else:
            comps.append(jnp.stack(carry[NSTATE:]).reshape(1, 4))
        return tuple(comps)

    def unpack(comps):
        rms = comps[NSTATE]
        if packed:
            return tuple(comps[:NSTATE]) + (rms[0:1], rms[1:2], rms[2:3],
                                            rms[3:4])
        return tuple(comps[:NSTATE]) + (rms[0, 0], rms[0, 1], rms[0, 2],
                                        rms[0, 3])

    def carry0(cn):
        zf = lambda *s: jnp.zeros(s, jnp.float32)
        zi = lambda *s: jnp.zeros(s, jnp.int32)
        inj_left0 = jnp.where((cn["has_prev"] == 0) & (cn["is_macro"] < 0.5),
                              P, 0).astype(jnp.int32)
        rms0 = ((zf(1, Bp),) * 4 if packed else
                (jnp.zeros(()),) * 4)
        return (zf(Cp, Lp), zf(Cp, Lp), zf(Vp, Lp), zf(Vp, Lp), zf(Vp, Lp),
                zi(1, Lp), jnp.full((Vp, R, Lp), -1, jnp.int32),
                zi(Vp, Lp), zf(K, Lp), inj_left0, zi(1, Lp)) + rms0

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    def t_spec(shape):  # per-step block, forward order
        return pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape))

    def rev_spec(shape):  # per-step block, reverse order
        return pl.BlockSpec((1,) + shape,
                            lambda i: (T - 1 - i,) + (0,) * len(shape))

    seq_params = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                      # 9x9 (Lp=1408) backward needs ~116MB
                                      # scoped vmem; v5e has 128MB total
                                      vmem_limit_bytes=127 * 1024 * 1024)
    QW = Bp if packed else 1  # width of the queue/reward outputs

    # ---- forward kernel(s): grid=(T,), carry in scratch -------------------
    def make_fwd_kernel(save_mode):
        # save_mode: None (plain forward), "slim" (custom-VJP residuals),
        # "full" (debug_forward — the whole carry trajectory)
        saved_idx = () if not save_mode else (
            FULL_IDX if save_mode == "full" else SLIM_IDX)
        n_extra = NEXTRA if save_mode else 0

        def fwd_kernel(action_ref, sched_ref, mnext_ref, mprev_ref, rand_ref,
                       *rest):
            if wide_ops:
                sig_ref, rest = rest[0], rest[1:]
            inj_ref, pool_ref, rest = rest[0], rest[1], rest[2:]
            cn = {k: ref[:] for k, ref in zip(const_names, rest[:n_const])}
            rest = rest[n_const:]
            qsum_ref, queues_ref, events_ref = rest[0], rest[1], rest[2]
            traj_refs = rest[3: 3 + len(saved_idx)]
            extra_refs = rest[3 + len(saved_idx):
                              3 + len(saved_idx) + n_extra]
            scratch = rest[3 + len(saved_idx) + n_extra:]
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():
                for ref, val in zip(scratch, pack(carry0(cn))):
                    ref[:] = val
                qsum_ref[:] = jnp.zeros((1, QW), jnp.float32)

            comps = [ref[:] for ref in scratch]
            if save_mode:
                for tref, j in zip(traj_refs, saved_idx):
                    tref[:] = comps[j][None]
            new_carry, queue, ev, extra = step(unpack(comps), t,
                                               action_ref[:],
                                               sched_ref[0], mnext_ref[0],
                                               mprev_ref[0], rand_ref[0],
                                               inj_ref[:], pool_ref[:], cn,
                                               early_exit=W >= 8,
                                               sig_t=(sig_ref[0] if wide_ops
                                                      else None))
            for ref, val in zip(scratch, pack(new_carry)):
                ref[:] = val
            if save_mode:
                # step-computed residuals: the backward skips the W-hop
                # walk loop and the route-container picks by replaying
                # these saved rows (a few KB/step)
                for eref, val in zip(extra_refs, extra):
                    eref[:] = val[None]
            queues_ref[:] = queue.reshape(1, 1, QW)
            events_ref[:] = ev[None]
            qsum_ref[:] = qsum_ref[:] + queue

        return fwd_kernel

    def run_forward(action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p,
                    pool_p, save_mode):
        out_shape = [jax.ShapeDtypeStruct((1, QW), jnp.float32),
                     jax.ShapeDtypeStruct((T, 1, QW), jnp.float32),
                     jax.ShapeDtypeStruct((T, 1, 8), jnp.float32)]
        out_specs = [full_spec((1, QW)), t_spec((1, QW)), t_spec((1, 8))]
        if save_mode:
            idx = FULL_IDX if save_mode == "full" else SLIM_IDX
            for j in idx:
                _, shp, dt_ = TRAJ[j]
                out_shape.append(jax.ShapeDtypeStruct((T,) + shp, dt_))
                out_specs.append(t_spec(shp))
            for _, shp, dt_ in EXTRA:
                out_shape.append(jax.ShapeDtypeStruct((T,) + shp, dt_))
                out_specs.append(t_spec(shp))
        sig_specs = [t_spec((NPp, 2))] if wide_ops else []
        sig_ops = (jnp.asarray(sig_tab),) if wide_ops else ()
        return pl.pallas_call(
            make_fwd_kernel(save_mode),
            grid=(T,),
            in_specs=[full_spec((NPp, NIp)), t_spec((1, Lp)),
                      t_spec((1, Lp)), t_spec((1, Lp)), t_spec((1, Lp))] +
                     sig_specs +
                     [full_spec((P, R, Lp)), full_spec((P_emit, R, Lp))] +
                     [full_spec(consts[k].shape) for k in const_names],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM(shp, dt_) for _, shp, dt_ in TRAJ],
            compiler_params=seq_params,
            interpret=interpret,
        )(action_p, sched_p, mnext_p, mprev_p, rand_p, *sig_ops, inj_p,
          pool_p, *(consts[k] for k in const_names))

    # ---- backward kernel: reverse grid, one jax.vjp of step per iter ------
    def bwd_kernel(action_ref, sched_ref, mnext_ref, mprev_ref, rand_ref,
                   *rest):
        if wide_ops:
            sig_ref, rest = rest[0], rest[1:]
        (inj_ref, pool_ref, g_qsum_ref, g_queues_ref), rest = \
            rest[:4], rest[4:]
        cn = {k: ref[:] for k, ref in
              zip(bwd_const_names, rest[:len(bwd_const_names)])}
        rest = rest[len(bwd_const_names):]
        traj_refs = rest[:len(SLIM_IDX)]
        rest = rest[len(SLIM_IDX):]
        extra_refs = rest[:NEXTRA]
        rest = rest[NEXTRA:]
        g_action_ref = rest[0]
        gscratch = rest[1:]
        i = pl.program_id(0)
        t = T - 1 - i
        rand_row = rand_ref[0]
        if wide_ops:
            gsv = None
            if save_gathers:
                (walk_i_ref, walk_f_ref, ids_ref, conv_ref,
                 gbw_ref, gt_ref, sig3_ref, gdf_ref,
                 gsg_ref) = extra_refs
                gsv = (gbw_ref[0], gt_ref[0], sig3_ref[0], gdf_ref[0],
                       gsg_ref[0])
            else:
                walk_i_ref, walk_f_ref, ids_ref, conv_ref = extra_refs
            route_h_s = ridx_h_s = None
            conv_s, ids_s = conv_ref[0], ids_ref[0]
        else:
            walk_i_ref, walk_f_ref, rh_ref, rx_ref = extra_refs
            route_h_s, ridx_h_s = rh_ref[0], rx_ref[0]
            conv_s = ids_s = gsv = None
        walk_i, walk_f = walk_i_ref[0], walk_f_ref[0]

        @pl.when(i == 0)
        def _init():
            for ref in gscratch:
                ref[:] = jnp.zeros(ref.shape, ref.dtype)
            g_action_ref[:] = jnp.zeros((NPp, NIp), jnp.float32)

        # reconstruct the TRAJ-ordered carry: slim-streamed comps from HBM,
        # the two dropped int planes as zero placeholders (never read under
        # head_saved replay — traced away before lowering)
        comps = []
        ref_it = iter(traj_refs)
        for j, (_, shp, dt_) in enumerate(TRAJ):
            comps.append(next(ref_it)[0] if j in SLIM_IDX
                         else jnp.zeros(shp, dt_))
        if packed:
            gq = g_qsum_ref[:] + g_queues_ref[0]  # [1, Bp]
        else:
            gq = g_qsum_ref[0, 0] + g_queues_ref[0, 0, 0]

        def fwd_t(floats, action2d):
            full = list(comps)
            for j, v in zip(FDIFF, floats):
                full[j] = v
            new_carry, queue, _, _ = step(unpack(full), t, action2d,
                                          sched_ref[0], mnext_ref[0],
                                          mprev_ref[0], rand_row,
                                          inj_ref[:], pool_ref[:], cn,
                                          walk_saved=walk_i,
                                          walk_saved_f=walk_f,
                                          head_saved=(route_h_s, ridx_h_s),
                                          sig_t=(sig_ref[0] if wide_ops
                                                 else None),
                                          conv_saved=conv_s,
                                          ids_saved=ids_s,
                                          gsv_saved=gsv)
            out = pack(new_carry)
            return tuple(out[j] for j in FDIFF), queue

        if Lp > _LANE * 2:
            # large scenes: the step vjp's full intermediate set exceeds the
            # 128 MB VMEM (register-allocator spills). Keep only matmul
            # results as residuals and recompute the [Lp, Lp] one-hot
            # intermediates during the transpose. (A bare policy fn — the
            # stock checkpoint_dots policy tags saveables with
            # reduce_precision ops Mosaic cannot lower.)
            fwd_t = jax.checkpoint(
                fwd_t, policy=lambda prim, *_, **__:
                prim.name == "dot_general")
        floats = tuple(comps[j] for j in FDIFF)
        _, vjp = jax.vjp(fwd_t, floats, action_ref[:])
        d_floats, d_action = vjp((tuple(ref[:] for ref in gscratch), gq))
        for ref, val in zip(gscratch, d_floats):
            ref[:] = val
        g_action_ref[:] = g_action_ref[:] + d_action

    def run_backward(action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p,
                     pool_p, resid, g_qsum, g_queues):
        # ``resid``: the slim carry blocks followed by the EXTRA blocks,
        # in run_forward("slim") output order
        sig_specs = [rev_spec((NPp, 2))] if wide_ops else []
        sig_ops = (jnp.asarray(sig_tab),) if wide_ops else ()
        return pl.pallas_call(
            bwd_kernel,
            grid=(T,),
            in_specs=[full_spec((NPp, NIp)), rev_spec((1, Lp)),
                      rev_spec((1, Lp)), rev_spec((1, Lp)),
                      rev_spec((1, Lp))] + sig_specs +
                     [full_spec((P, R, Lp)), full_spec((P_emit, R, Lp)),
                      full_spec((1, QW)), rev_spec((1, QW))] +
                     [full_spec(consts[k].shape) for k in bwd_const_names] +
                     [rev_spec(TRAJ[j][1]) for j in SLIM_IDX] +
                     [rev_spec(shp) for _, shp, _ in EXTRA],
            out_specs=full_spec((NPp, NIp)),
            out_shape=jax.ShapeDtypeStruct((NPp, NIp), jnp.float32),
            scratch_shapes=[pltpu.VMEM(TRAJ[j][1], TRAJ[j][2])
                            for j in FDIFF],
            compiler_params=seq_params,
            interpret=interpret,
        )(action_p, sched_p, mnext_p, mprev_p, rand_p, *sig_ops, inj_p,
          pool_p, g_qsum, g_queues, *(consts[k] for k in bwd_const_names),
          *resid)

    # ---- custom-VJP episode over padded arrays -----------------------------
    def _outs(qsum, queues, events):
        if packed:
            return qsum[0], queues[:, 0, :], events[:, 0, :]
        return qsum[0, 0], queues[:, 0, 0], events[:, 0, :]

    @jax.custom_vjp
    def episode(action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p,
                pool_p):
        qsum, queues, events = run_forward(action_p, sched_p, mnext_p,
                                           mprev_p, rand_p, inj_p, pool_p,
                                           save_mode=None)
        return _outs(qsum, queues, events)

    def ep_fwd(action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p,
               pool_p):
        qsum, queues, events, *resid = run_forward(
            action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p, pool_p,
            save_mode="slim")
        return _outs(qsum, queues, events), (
            action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p, pool_p,
            resid)

    def ep_bwd(res, cots):
        (action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p, pool_p,
         resid) = res
        g_qsum, g_queues, _ = cots  # event counts carry no gradient
        ga = run_backward(action_p, sched_p, mnext_p, mprev_p, rand_p, inj_p,
                          pool_p, resid,
                          jnp.reshape(g_qsum, (1, QW)),
                          jnp.reshape(g_queues, (T, 1, QW)))
        return ga, None, None, None, None, None, None

    episode.defvjp(ep_fwd, ep_bwd)

    def fn(action2d, schedule, mnext, mprev, rand, inj_routes,
           emit_routes, with_events: bool = False):
        action_p = jnp.zeros((NPp, NIp), jnp.float32).at[
            :n_phases, :n_inter].set(jnp.asarray(action2d))
        pad_t = lambda x, fill: jnp.pad(
            jnp.asarray(x)[:, None, :], ((0, 0), (0, 0), (0, Lp - L)),
            constant_values=fill)
        # wide_ops: the pools enter the kernel as f32 so the per-step
        # [P, R, Lp] casts inside the pool picks trace away (route ids are
        # small ints — exact in f32; the picks round-trip via astype(int32))
        pool_dt = jnp.float32 if wide_ops else jnp.int32
        inj_p = jnp.pad(
            jnp.transpose(jnp.asarray(inj_routes, pool_dt), (1, 2, 0)),
            ((0, 0), (0, 0), (0, Lp - L)), constant_values=-1)  # [P, R, Lp]
        pool_p = jnp.pad(
            jnp.transpose(jnp.asarray(emit_routes, pool_dt), (1, 2, 0)),
            ((0, 0), (0, 0), (0, Lp - L)), constant_values=-1)
        qsum, queues, events = episode(
            action_p, pad_t(schedule.astype(jnp.float32), 0.0),
            pad_t(mnext.astype(jnp.int32), -1),
            pad_t(mprev.astype(jnp.int32), -1),
            pad_t(rand.astype(jnp.float32), 2.0), inj_p, pool_p)
        if packed:
            # per-episode rewards [B] and queue curves [T, B]
            qsum, queues = qsum[:B_ep], queues[:, :B_ep]
        if with_events:
            # [T, 8] per-step rows: injected, emitted, absorbed,
            # transferred, transfer wins, deposit wins, removals,
            # max wave speed (CFL diagnostic)
            return -qsum, queues, events
        return -qsum, queues

    def debug_forward(action2d, schedule, mnext, mprev, rand, inj_routes,
                      emit_routes):
        """Run the residual-saving forward and return the whole per-step
        carry trajectory as ``{name: [T, ...]}`` (padded shapes). Parity
        debugging only."""
        action_p = jnp.zeros((NPp, NIp), jnp.float32).at[
            :n_phases, :n_inter].set(jnp.asarray(action2d))
        pad_t = lambda x, fill: jnp.pad(
            jnp.asarray(x)[:, None, :], ((0, 0), (0, 0), (0, Lp - L)),
            constant_values=fill)
        pool_dt = jnp.float32 if wide_ops else jnp.int32
        inj_p = jnp.pad(
            jnp.transpose(jnp.asarray(inj_routes, pool_dt), (1, 2, 0)),
            ((0, 0), (0, 0), (0, Lp - L)), constant_values=-1)
        pool_p = jnp.pad(
            jnp.transpose(jnp.asarray(emit_routes, pool_dt), (1, 2, 0)),
            ((0, 0), (0, 0), (0, Lp - L)), constant_values=-1)
        outs = run_forward(action_p, pad_t(schedule.astype(jnp.float32), 0.0),
                           pad_t(mnext.astype(jnp.int32), -1),
                           pad_t(mprev.astype(jnp.int32), -1),
                           pad_t(rand.astype(jnp.float32), 2.0), inj_p,
                           pool_p, save_mode="full")
        qsum, queues, events = outs[0], outs[1], outs[2]
        traj = {name: arr for (name, _, _), arr in zip(TRAJ, outs[3:])}
        traj["queues"] = queues[:, 0, 0]
        traj["events"] = events[:, 0, :]
        traj["qsum"] = qsum[0, 0]
        return traj

    def step_cost():
        """XLA cost analysis of ONE step — the same jnp graph the kernel
        runs per grid iteration — for the bench's roofline/MFU accounting.

        Returns ``{"flops_fwd", "bytes_fwd", "flops_bwd", "bytes_bwd"}``
        per simulation step. ``bytes_*`` are XLA's *accessed* bytes for the
        un-fused step graph (an upper bound on what the fused kernel
        touches in VMEM, not HBM traffic — HBM is the residual stream, see
        ``residual_bytes_per_step``)."""
        cnj = {k: jnp.asarray(v) for k, v in consts.items()}
        carry = pack(carry0(cnj))
        args = (jnp.zeros((), jnp.int32), jnp.zeros((NPp, NIp)),
                jnp.zeros((1, Lp)), jnp.zeros((1, Lp), jnp.int32),
                jnp.zeros((1, Lp), jnp.int32), jnp.ones((1, Lp)),
                jnp.zeros((P, R, Lp), jnp.int32),
                jnp.zeros((P_emit, R, Lp), jnp.int32))

        def fwd1(comps, t, action2d, sched, mnext, mprev, rand, inj, pool):
            # same early_exit flag as the real forward kernel (run_forward)
            # so the analyzed graph is the one the grid iteration executes
            # (the while_loop body counts once ~ the typical 0-1 dynamic
            # iterations left after the hop peel)
            new, queue, ev, _ = step(unpack(list(comps)), t, action2d,
                                     sched, mnext, mprev, rand, inj, pool,
                                     cnj, early_exit=W >= 8)
            return pack(new), queue, ev

        def bwd1(floats, action2d, t, sched, mnext, mprev, rand, inj, pool):
            def f(fl, a):
                full = list(carry)
                for j, v in zip(FDIFF, fl):
                    full[j] = v
                # mirror the real backward: walk + head rows replayed from
                # saved residuals, so their recompute cost never appears
                new, queue, _, _ = step(
                    unpack(full), t, a, sched, mnext, mprev, rand, inj,
                    pool, cnj,
                    walk_saved=jnp.zeros((2, Lp), jnp.int32),
                    walk_saved_f=jnp.zeros((1, Lp)),
                    head_saved=((None, None) if wide_ops else
                                (jnp.zeros((R, Lp), jnp.int32),
                                 jnp.zeros((1, Lp), jnp.int32))),
                    conv_saved=(jnp.zeros((6, Lp), jnp.int32)
                                if wide_ops else None),
                    ids_saved=(jnp.zeros((1, 5 * Lp), jnp.int32)
                               if wide_ops else None))
                out = pack(new)
                return tuple(out[j] for j in FDIFF), queue
            _, vjp = jax.vjp(f, floats, action2d)
            return vjp((tuple(jnp.zeros_like(carry[j]) for j in FDIFF),
                        jnp.zeros(())))

        def analyze(f, *a):
            c = jax.jit(f).lower(*a).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return c or {}

        floats = tuple(carry[j] for j in FDIFF)
        c_f = analyze(fwd1, carry, *args)
        c_b = analyze(bwd1, floats, args[1], args[0], *args[2:])
        return dict(flops_fwd=float(c_f.get("flops", 0.0)),
                    bytes_fwd=float(c_f.get("bytes accessed", 0.0)),
                    flops_bwd=float(c_b.get("flops", 0.0)),
                    bytes_bwd=float(c_b.get("bytes accessed", 0.0)))

    def step_hlo():
        """Optimized-HLO text of the per-step fwd and bwd-replay graphs
        (same graphs as :func:`step_cost`) for op-stream composition
        analysis (``bench/step_ops.py``)."""
        cnj = {k: jnp.asarray(v) for k, v in consts.items()}
        carry = pack(carry0(cnj))
        args = (jnp.zeros((), jnp.int32), jnp.zeros((NPp, NIp)),
                jnp.zeros((1, Lp)), jnp.zeros((1, Lp), jnp.int32),
                jnp.zeros((1, Lp), jnp.int32), jnp.ones((1, Lp)),
                jnp.zeros((P, R, Lp), jnp.int32),
                jnp.zeros((P_emit, R, Lp), jnp.int32))

        def fwd1(comps, t, action2d, sched, mnext, mprev, rand, inj, pool):
            # same early_exit flag as the real forward kernel (run_forward)
            # so the analyzed graph is the one the grid iteration executes
            # (the while_loop body counts once ~ the typical 0-1 dynamic
            # iterations left after the hop peel)
            new, queue, ev, _ = step(unpack(list(comps)), t, action2d,
                                     sched, mnext, mprev, rand, inj, pool,
                                     cnj, early_exit=W >= 8)
            return pack(new), queue, ev

        def bwd1(floats, action2d, t, sched, mnext, mprev, rand, inj, pool):
            def f(fl, a):
                full = list(carry)
                for j, v in zip(FDIFF, fl):
                    full[j] = v
                new, queue, _, _ = step(
                    unpack(full), t, a, sched, mnext, mprev, rand, inj,
                    pool, cnj,
                    walk_saved=jnp.zeros((2, Lp), jnp.int32),
                    walk_saved_f=jnp.zeros((1, Lp)),
                    head_saved=((None, None) if wide_ops else
                                (jnp.zeros((R, Lp), jnp.int32),
                                 jnp.zeros((1, Lp), jnp.int32))),
                    conv_saved=(jnp.zeros((6, Lp), jnp.int32)
                                if wide_ops else None),
                    ids_saved=(jnp.zeros((1, 5 * Lp), jnp.int32)
                               if wide_ops else None))
                out = pack(new)
                return tuple(out[j] for j in FDIFF), queue
            _, vjp = jax.vjp(f, floats, action2d)
            return vjp((tuple(jnp.zeros_like(carry[j]) for j in FDIFF),
                        jnp.zeros(())))

        def text(f, *a):
            lowered = jax.jit(f).lower(*a)
            # optimized HLO for op counts; StableHLO with debug locs for
            # source-line attribution (this jaxlib's compiled HLO carries
            # only stack_frame_id, not inline source_file/line)
            return (lowered.compile().as_text(),
                    lowered.as_text(debug_info=True))

        floats = tuple(carry[j] for j in FDIFF)
        fwd_t, fwd_m = text(fwd1, carry, *args)
        bwd_t, bwd_m = text(bwd1, floats, args[1], args[0], *args[2:])
        return dict(fwd=fwd_t, bwd=bwd_t, fwd_mlir=fwd_m, bwd_mlir=bwd_m)

    fn.debug_forward = debug_forward
    fn.step_cost = step_cost
    fn.step_hlo = step_hlo
    # HBM residual stream: each slim carry block + EXTRA block is written
    # once by the forward and read once by the backward, per step
    fn.residual_bytes_per_step = int(sum(
        int(np.prod(shp)) * 4
        for shp in ([TRAJ[j][1] for j in SLIM_IDX] +
                    [shp for _, shp, _ in EXTRA])))
    fn.banded = banded
    fn.wide_ops = wide_ops
    fn.geometry = dict(L=L, Lp=Lp, Cp=Cp, Vp=Vp, R=R, K=K, W=W, T=T,
                       n_phases=n_phases, n_inter=n_inter,
                       episodes=B_ep if packed else 1,
                       band=band, banded_win=win if banded else 0,
                       banded_chunk=chunk_c if banded else 0,
                       lead_latch=lead_latch, hop1_banded=hop1_banded,
                       n_hop_peel=len(peel_geoms),
                       compact_walk=compact_walk,
                       save_gathers=save_gathers,
                       compact_slots=S_cw if compact_walk else 0)
    return fn
