"""Explicit-collective spatial (lane-axis) sharding of the network step.

:func:`dhts.parallel.mesh.lane_sharded_rollout` shards the same state arrays
but leaves the cross-lane reads to XLA's SPMD partitioner, which lowers each
boundary/conversion gather over the lane axis into collectives sized by the
arrays they touch (worst case: all-gathering whole ``[L, C]`` / ``[L, V]``
state blocks every step). This module instead runs the step body under
``shard_map`` with every cross-lane read funneled through explicit
``all_gather``s of small per-lane **summary rows** — the observation being
that nothing in the reference's step semantics (``RoadNetwork.forward``,
``road/network/road_network.py:79-111`` + ``conversion.py``) ever reads more
than O(1) values of a *remote* lane:

* **pre-physics** (8 floats/lane): edge cells (first/last ``r``/``u``) and
  tail-vehicle fields, feeding ghost-cell resolution
  (``get_macro_boundary``) and the route-window leader search
  (``setup_micro_boundary``'s live path);
* **post-physics** (15 floats + 3 ints + R route entries per lane): edge
  cells, head-vehicle fields, flux-capacitor value and MacroRoute
  successor, feeding the conversion pass. Conversion *arbitration* (one
  insert per destination per step) is computed redundantly — and therefore
  deterministically identically — on every device from the gathered
  summary; each device then applies only its own lanes' removals, inserts,
  deposits and capacitor decrements.

Per-lane physics (Godunov, IDM) and all state mutation stay device-local.
Collective volume per step is ``O(L * (23 + R))`` scalars — independent of
C, V, the route-pool size and the cell counts — riding ICI as three fused
all-gathers (f32 matrix, i32 matrix, route block).

Gradients: ``all_gather`` is linear (its transpose is a ``psum_scatter``),
and the straight-through event semantics (``grad_carrier`` on emission,
``st_clip`` on deposits, detached capacitor decrement) are used verbatim,
so ``jax.grad`` through a sharded rollout matches the unsharded
:func:`dhts.models.network.network_step` scan (tests/test_spatial.py).

The building blocks (:func:`summary_pre`, :func:`macro_ghosts`,
:func:`leader_search`, :func:`conversion_sharded`) are exposed so sharded
*applications* can compose them with their own boundary logic — the ITSCP
episode does (:mod:`dhts.apps.control.itscp.spatial`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dhts.models import network as net
from dhts.models.scene import SceneSpec
from dhts.models.vehicle import default_params
from dhts.ops import arz
from dhts.ops.dmath import detached, grad_carrier, st_clip

# Column layout of the two gathered summary matrices.
_PRE = ("r_first", "u_first", "r_last", "u_last", "count", "tail_pos",
        "tail_vel", "tail_len")
_POSTF = ("r_last", "u_last", "count", "tail_pos", "tail_len", "cap_val",
          "head_pos", "head_vel", "head_len", "head_a", "accel_max",
          "accel_pref", "target_speed", "min_space", "time_pref")
_POSTI = ("macro_next", "head_ridx", "head_vid")


def _cols(names, mat):
    return {k: mat[:, i] for i, k in enumerate(names)}


class SpatialContext(NamedTuple):
    """Replicated constants shared by all spatial-sharding helpers."""

    axis_name: str
    L: int  # global lane count
    l_loc: int  # lanes per device
    is_macro_g: jax.Array  # bool[L] (global, replicated constant)
    length_g: jax.Array  # f32[L]
    pc_g: np.ndarray  # i32[L, K] clipped global predecessor lists
    prev_valid_g: np.ndarray  # bool[L, K]
    veh_len: float
    u_max: float

    def gather(self, x):
        return lax.all_gather(x, self.axis_name, axis=0, tiled=True)

    def local_slice(self, x):
        off = lax.axis_index(self.axis_name) * self.l_loc
        return lax.dynamic_slice_in_dim(x, off, self.l_loc, 0)


def make_context(spec: SceneSpec, mesh: Mesh,
                 axis_name: str = "lane") -> SpatialContext:
    L = int(spec.num_lanes)
    n_shard = int(mesh.shape[axis_name])
    assert L % n_shard == 0, \
        f"{L} lanes not divisible over {n_shard} '{axis_name}' devices"
    prev_g = np.asarray(spec.prev_lanes)
    return SpatialContext(
        axis_name=axis_name, L=L, l_loc=L // n_shard,
        is_macro_g=jnp.asarray(np.asarray(spec.is_macro).astype(bool)),
        length_g=jnp.asarray(np.asarray(spec.length, np.float32)),
        pc_g=np.clip(prev_g, 0, L - 1), prev_valid_g=prev_g >= 0,
        veh_len=float(spec.vehicle_length),
        u_max=float(spec.speed_limit))


def lane_pspec(x, num_lanes: int, axis_name: str = "lane") -> P:
    """The one sharding rule for simulation state: arrays whose leading
    axis is the lane axis shard over ``axis_name``, everything else
    replicates. Shared by the explicit-collective path here and the
    compiler-managed :func:`dhts.parallel.mesh.lane_sharded_rollout`."""
    x = jnp.asarray(x)
    if x.ndim >= 1 and x.shape[0] == num_lanes:
        return P(axis_name, *([None] * (x.ndim - 1)))
    return P()


def state_partition_specs(state, num_lanes: int, axis_name: str = "lane"):
    """PartitionSpec pytree for a :class:`NetworkState` (or any pytree),
    via :func:`lane_pspec` per leaf."""
    return jax.tree.map(lambda x: lane_pspec(x, num_lanes, axis_name),
                        state)


# ---------------------------------------------------------------------------
# pre-physics summary + boundary building blocks
# ---------------------------------------------------------------------------


def summary_pre(ctx: SpatialContext, spec_loc, state_loc):
    """[l, 8] per-local-lane rows: edge cells + tail-vehicle fields."""
    mac, mic = state_loc.macro, state_loc.micro
    u = net.macro_cell_u(spec_loc, mac)
    arl = jnp.arange(ctx.l_loc)
    last = jnp.clip(spec_loc.num_cell - 1, 0, spec_loc.max_cells - 1)
    return jnp.stack([
        mac.r[:, 0], u[:, 0], mac.r[arl, last], u[arl, last],
        mic.count.astype(jnp.float32), mic.position[:, 0],
        mic.speed[:, 0], mic.params.length[:, 0]], axis=1)


def macro_ghosts(ctx: SpatialContext, spec_loc, state_loc, gA):
    """Raw neighbor-edge ghost cells for the local lanes (parity:
    ``net.get_macro_boundary`` both sides), from the gathered summary."""
    A = _cols(_PRE, gA)
    mac = state_loc.macro

    def side(num_adj, adj0, routed, nb_r_col, nb_u_col, ext_r, ext_u):
        adj = jnp.where(num_adj == 1, adj0, routed)
        adj_c = jnp.clip(adj, 0, ctx.L - 1)
        use_nb = (num_adj > 0) & (adj >= 0) & ctx.is_macro_g[adj_c]
        return (jnp.where(use_nb, nb_r_col[adj_c], ext_r),
                jnp.where(use_nb, nb_u_col[adj_c], ext_u))

    left_r, left_u = side(spec_loc.num_prev, spec_loc.prev_lanes[:, 0],
                          state_loc.macro_prev, A["r_last"], A["u_last"],
                          mac.ext_left_r, mac.ext_left_u)
    right_r, right_u = side(spec_loc.num_next, spec_loc.next_lanes[:, 0],
                            state_loc.macro_next, A["r_first"], A["u_first"],
                            mac.ext_right_r, mac.ext_right_u)
    return left_r, left_u, right_r, right_u


def leader_search(ctx: SpatialContext, spec_loc, state_loc, gA):
    """Route-window virtual-leader search for the local lanes (parity:
    ``net.find_micro_leader``), remote tail/count fields from the summary."""
    A = _cols(_PRE, gA)
    mic = state_loc.micro
    R = mic.route.shape[2]
    arl = jnp.arange(ctx.l_loc)
    head = net.micro_head_info(spec_loc, state_loc)
    offs = jnp.arange(1, R)
    j = head["route_idx"][:, None] + offs[None, :]
    w = jnp.where(j < R, head["route"][arl[:, None], jnp.clip(j, 0, R - 1)],
                  -1)
    exists = w >= 0
    wc = jnp.clip(w, 0, ctx.L - 1)
    w_macro = exists & ctx.is_macro_g[wc]
    occupied = exists & ~ctx.is_macro_g[wc] & (A["count"][wc] > 0.5)
    term = ~exists | w_macro | occupied
    any_term = jnp.any(term, axis=1)
    first = jnp.argmax(term, axis=1)
    pass_len = jnp.where(exists & ~term, ctx.length_g[wc], 0.0)
    cum = jnp.concatenate(
        [jnp.zeros((ctx.l_loc, 1)), jnp.cumsum(pass_len, axis=1)[:, :-1]],
        axis=1)
    cur_delta = (spec_loc.length - head["position"] - head["length"] * 0.5 +
                 cum[arl, first])
    lead = wc[arl, first]
    found = head["exists"] & any_term & occupied[arl, first]
    pd = jnp.where(found,
                   jnp.maximum(cur_delta + A["tail_pos"][lead] -
                               A["tail_len"][lead] * 0.5, 0.0),
                   net.DEFAULT_HEAD_POSITION_DELTA)
    sd = jnp.where(found, head["speed"] - A["tail_vel"][lead],
                   net.DEFAULT_HEAD_SPEED_DELTA)
    return pd, sd


# ---------------------------------------------------------------------------
# conversion (post-physics)
# ---------------------------------------------------------------------------


def _summary_post(ctx, spec_loc, state_loc, cap_val, u):
    """Post-physics summary rows feeding conversion; ``cap_val`` is the
    local per-lane capacitor value AFTER flux accumulation, ``u`` the
    caller's already-computed cell speeds for the same macro state."""
    mac, mic = state_loc.macro, state_loc.micro
    arl = jnp.arange(ctx.l_loc)
    V = mic.position.shape[1]
    last = jnp.clip(spec_loc.num_cell - 1, 0, spec_loc.max_cells - 1)
    h = jnp.clip(mic.count - 1, 0, V - 1)
    p = mic.params
    floats = jnp.stack([
        mac.r[arl, last], u[arl, last], mic.count.astype(jnp.float32),
        mic.position[:, 0], p.length[:, 0], cap_val,
        mic.position[arl, h], mic.speed[arl, h], p.length[arl, h],
        p.a[arl, h], p.accel_max[arl, h], p.accel_pref[arl, h],
        p.target_speed[arl, h], p.min_space[arl, h],
        p.time_pref[arl, h]], axis=1)
    ints = jnp.stack([state_loc.macro_next, mic.route_idx[arl, h],
                      mic.vid[arl, h]], axis=1)
    return floats, ints, mic.route[arl, h]  # route rows [l, R]


def _conversion_global(ctx, gF, gI, gRoute, V: int, R: int):
    """Event requests + arbitration for ALL lanes from the gathered
    summaries (every device computes this identically). Mirrors
    ``dhts.models.conversion.apply`` sections 1-4."""
    F = _cols(_POSTF, gF)
    I = _cols(_POSTI, gI)
    L, INF = ctx.L, jnp.int32(ctx.L)
    ar = jnp.arange(L)
    count = F["count"].astype(jnp.int32)
    mn = I["macro_next"]
    mn_c = jnp.clip(mn, 0, L - 1)
    next_is_micro = ctx.is_macro_g & (mn >= 0) & ~ctx.is_macro_g[mn_c]
    dest_count = count[mn_c]
    free_space = jnp.where(dest_count > 0,
                           F["tail_pos"][mn_c] - 0.5 * F["tail_len"][mn_c],
                           ctx.length_g[mn_c])
    want_emit = (next_is_micro & (detached(F["cap_val"]) >= ctx.veh_len) &
                 (free_space >= ctx.veh_len) & (dest_count < V))

    h_exists = count > 0
    j = jnp.clip(I["head_ridx"] + 1, 0, R - 1)
    hnext = jnp.where(I["head_ridx"] + 1 < R, gRoute[ar, j], -1)
    hn_c = jnp.clip(hnext, 0, L - 1)
    past_end = h_exists & (F["head_pos"] >= ctx.length_g)
    exit_none = past_end & (hnext < 0)
    nxt_micro = (hnext >= 0) & ~ctx.is_macro_g[hn_c]
    nxt_macro = (hnext >= 0) & ctx.is_macro_g[hn_c]
    want_tr = past_end & nxt_micro & (count[hn_c] < V)
    want_dep = h_exists & nxt_macro & (F["head_pos"] >
                                       ctx.length_g + F["head_len"])

    pc, pv = ctx.pc_g, ctx.prev_valid_g
    cand_emit = pv & want_emit[pc] & (mn_c[pc] == ar[:, None])
    cand_tr = pv & want_tr[pc] & (hn_c[pc] == ar[:, None])
    best = jnp.min(jnp.where(cand_emit | cand_tr, pc, INF),
                   axis=1).astype(jnp.int32)
    emit_win = want_emit & (best[mn_c] == ar)
    cand_dep = pv & want_dep[pc] & (hn_c[pc] == ar[:, None])
    dep_best = jnp.min(jnp.where(cand_dep, pc, INF),
                       axis=1).astype(jnp.int32)
    dep_win = want_dep & (dep_best[hn_c] == ar)
    tr_win = want_tr & (best[hn_c] == ar)

    has_insert = best < INF
    src = jnp.clip(best, 0, L - 1)
    is_emit = has_insert & ctx.is_macro_g[src]
    emit_rank = jnp.cumsum(is_emit.astype(jnp.int32)) - 1
    return dict(remove=exit_none | dep_win | tr_win, emit_win=emit_win,
                best=best, dep_best=dep_best, has_insert=has_insert,
                src=src, is_emit=is_emit, emit_rank=emit_rank,
                n_emit=jnp.sum(is_emit.astype(jnp.int32)),
                absorbed=jnp.sum((exit_none | dep_win).astype(jnp.int32)))


def _conversion_local(ctx, spec_loc, state_loc, cap, slot, G, gF, gI,
                      gRoute):
    """Apply the globally-arbitrated events to the local lane block
    (mirrors ``conversion.apply`` sections 5-8)."""
    F = _cols(_POSTF, gF)
    I = _cols(_POSTI, gI)
    L, INF = ctx.L, jnp.int32(ctx.L)
    l_loc = ctx.l_loc
    mac, mic = state_loc.macro, state_loc.micro
    C = spec_loc.max_cells
    P_pool = state_loc.route_pool.shape[1]
    arl = jnp.arange(l_loc)
    sl = ctx.local_slice

    remove = sl(G["remove"])
    count_after_remove = mic.count - remove.astype(jnp.int32)

    # capacitor decrement on emission (detached; grad rides emit_a)
    emit_win = sl(G["emit_win"])
    cap_val = cap[arl, slot]
    cap_after = jnp.where(emit_win, detached(cap_val - ctx.veh_len), cap_val)
    cap = cap.at[arl, slot].set(cap_after)

    # inserts into local destination lanes
    has_insert = sl(G["has_insert"])
    src = sl(G["src"])  # global source lane ids
    is_emit = sl(G["is_emit"])
    defaults = default_params(ctx.u_max, (l_loc,), ctx.veh_len)
    emit_a = grad_carrier(jnp.full((L,), ctx.veh_len, jnp.float32),
                          gF[:, _POSTF.index("cap_val")])[src]
    new_pos = jnp.where(is_emit, 0.0, F["head_pos"][src] - ctx.length_g[src])
    new_vel = jnp.where(is_emit, F["u_last"][src], F["head_vel"][src])
    pick = lambda dflt, col: jnp.where(is_emit, dflt, col[src])
    new_params = type(mic.params)(
        accel_max=pick(defaults.accel_max, F["accel_max"]),
        accel_pref=pick(defaults.accel_pref, F["accel_pref"]),
        target_speed=pick(defaults.target_speed, F["target_speed"]),
        min_space=pick(defaults.min_space, F["min_space"]),
        time_pref=pick(defaults.time_pref, F["time_pref"]),
        length=pick(defaults.length, F["head_len"]),
        a=jnp.where(is_emit, emit_a, F["head_a"][src]))
    pool_idx = state_loc.route_pool_cursor % P_pool
    pooled_route = state_loc.route_pool[arl, pool_idx]
    new_route = jnp.where(is_emit[:, None], pooled_route, gRoute[src])
    new_ridx = jnp.where(is_emit, 0, I["head_ridx"][src] + 1)
    new_vid = jnp.where(is_emit, state_loc.veh_counter + sl(G["emit_rank"]),
                        I["head_vid"][src])

    def tail_insert(x, newval):
        return net.tail_insert_rows(x, newval, has_insert)

    micro = mic._replace(
        position=tail_insert(mic.position, new_pos),
        speed=tail_insert(mic.speed, new_vel),
        params=jax.tree.map(tail_insert, mic.params, new_params),
        route=tail_insert(mic.route, new_route),
        route_idx=tail_insert(mic.route_idx, new_ridx),
        vid=tail_insert(mic.vid, new_vid),
        count=count_after_remove + has_insert.astype(jnp.int32))
    cursor = state_loc.route_pool_cursor + is_emit.astype(jnp.int32)

    # micro -> macro deposits into local macro lanes
    dep_best = sl(G["dep_best"])
    dep_has = dep_best < INF
    s = jnp.clip(dep_best, 0, L - 1)
    v_head = F["head_pos"][s] - ctx.length_g[s]
    v_tail = v_head - F["head_len"][s]
    cells = jnp.arange(C, dtype=jnp.float32)
    c_tail = cells[None, :] * spec_loc.cell_length[:, None]
    c_head = (cells[None, :] + 1.0) * spec_loc.cell_length[:, None]
    ov = ((c_head > v_tail[:, None]) & (c_tail < v_head[:, None]) &
          spec_loc.cell_mask & dep_has[:, None] &
          (spec_loc.cell_length > v_tail)[:, None])
    max_head = jnp.maximum(c_head, v_head[:, None])
    min_tail = jnp.minimum(c_tail, v_tail[:, None])
    overlap = (spec_loc.cell_length[:, None] + F["head_len"][s][:, None] -
               (max_head - min_tail))
    add_r = (F["head_a"][s][:, None] / detached(F["head_len"][s])[:, None] *
             (overlap / spec_loc.cell_length[:, None]))
    n_r = st_clip(mac.r + add_r, 1e-5, 1.0 - 1e-5)
    dep_u = jnp.broadcast_to(F["head_vel"][s][:, None], (l_loc, C))
    macro = mac._replace(
        r=jnp.where(ov, n_r, mac.r),
        y=jnp.where(ov, arz.compute_y(n_r, dep_u, ctx.u_max), mac.y),
        flux_capacitor=cap)

    return state_loc._replace(
        macro=macro, micro=micro,
        veh_counter=state_loc.veh_counter + G["n_emit"],
        route_pool_cursor=cursor)


def conversion_sharded(ctx: SpatialContext, spec_loc, state_loc, delta_time):
    """The full sharded conversion pass on post-physics local state:
    capacitor accumulation (local) -> summary gather -> global arbitration
    -> local application. Returns ``(state_loc, n_emit, absorbed)``."""
    mac = state_loc.macro
    arl = jnp.arange(ctx.l_loc)
    u = net.macro_cell_u(spec_loc, mac)
    last = jnp.clip(spec_loc.num_cell - 1, 0, spec_loc.max_cells - 1)
    mn_loc = state_loc.macro_next
    mn_lc = jnp.clip(mn_loc, 0, ctx.L - 1)
    next_is_micro = (spec_loc.is_macro & (mn_loc >= 0) &
                     ~ctx.is_macro_g[mn_lc])
    inc = jnp.where(next_is_micro,
                    mac.r[arl, last] * u[arl, last] * delta_time, 0.0)
    slot = jnp.argmax(spec_loc.next_lanes == mn_loc[:, None], axis=1)
    cap = mac.flux_capacitor.at[arl, slot].add(inc)
    cap_val = cap[arl, slot]

    V = state_loc.micro.position.shape[1]
    R = state_loc.micro.route.shape[2]
    sF, sI, sRoute = _summary_post(ctx, spec_loc, state_loc, cap_val, u)
    gF, gI, gRoute = ctx.gather(sF), ctx.gather(sI), ctx.gather(sRoute)
    G = _conversion_global(ctx, gF, gI, gRoute, V, R)
    state_loc = _conversion_local(ctx, spec_loc, state_loc, cap, slot, G,
                                  gF, gI, gRoute)
    return state_loc, G["n_emit"], G["absorbed"]


# ---------------------------------------------------------------------------
# the composed default step / rollout
# ---------------------------------------------------------------------------


def make_spatial_step(spec: SceneSpec, mesh: Mesh, delta_time,
                      axis_name: str = "lane"):
    """Build the shard_map-local network step.

    Returns ``step_local(spec_loc, state_loc) -> (state_loc, diag)`` meant
    to run inside ``shard_map`` with the lane axis sharded over
    ``axis_name``; ``spec_loc`` is the lane-sliced :class:`SceneSpec` (pass
    the full spec through shard_map with :func:`state_partition_specs`-style
    specs so each device receives its slice). Semantics are exactly
    :func:`dhts.models.network.network_step` with the default boundary.
    """
    ctx = make_context(spec, mesh, axis_name)

    def step_local(spec_loc, state_loc):
        gA = ctx.gather(summary_pre(ctx, spec_loc, state_loc))
        left_r, left_u, right_r, right_u = macro_ghosts(ctx, spec_loc,
                                                        state_loc, gA)
        pd, sd = leader_search(ctx, spec_loc, state_loc, gA)
        bv = net.BoundaryValues(left_r=left_r, left_u=left_u,
                                right_r=right_r, right_u=right_u,
                                head_position_delta=pd,
                                head_speed_delta=sd)
        state_loc, max_wave, n_coll = net.lanes_forward(
            spec_loc, state_loc, bv, delta_time)
        state_loc, n_emit, absorbed = conversion_sharded(
            ctx, spec_loc, state_loc, delta_time)
        diag = net.StepDiagnostics(
            max_wave_speed=max_wave,
            # like emitted/absorbed, the collision count is a global
            # diagnostic (int: no cotangent concerns)
            num_collisions=lax.psum(n_coll, axis_name),
            emitted=n_emit, absorbed=absorbed)
        return state_loc, diag

    return step_local


def make_spatial_rollout(spec: SceneSpec, mesh: Mesh, delta_time,
                         num_steps: int, axis_name: str = "lane"):
    """Jitted ``fn(state) -> (state, max_wave[T])`` running ``num_steps``
    explicit-collective sharded steps (scan inside shard_map; one local
    program per device, three small all-gathers per step)."""
    step_local = make_spatial_step(spec, mesh, delta_time, axis_name)
    L = int(spec.num_lanes)

    def local_rollout(spec_loc, state_loc):
        def body(s, _):
            s, diag = step_local(spec_loc, s)
            # replicate the scalar diagnostic so it can leave the
            # shard_map with a P() (replicated) out_spec; stop_gradient
            # because pmax has no differentiation rule (and a CFL monitor
            # should not contribute cotangents anyway)
            return s, lax.pmax(
                lax.stop_gradient(jnp.max(diag.max_wave_speed)), axis_name)

        return lax.scan(body, state_loc, None, length=num_steps)

    def rollout(state):
        st_specs = state_partition_specs(state, L, axis_name)
        sp_specs = state_partition_specs(spec, L, axis_name)
        f = jax.shard_map(local_rollout, mesh=mesh,
                          in_specs=(sp_specs, st_specs),
                          out_specs=(st_specs, P()), check_vma=False)
        return f(spec, state)

    return jax.jit(rollout)
