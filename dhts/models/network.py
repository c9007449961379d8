"""Network state + the fused per-step orchestrator.

TPU redesign of the reference's ``RoadNetwork.forward`` pipeline
(``road/network/road_network.py:79-111``): boundary resolution -> lane
stepping -> hybrid conversion, with every per-lane / per-vehicle Python loop
replaced by one masked array op over the whole network. The step is a pure
function ``(spec, state) -> (state, diagnostics)`` suitable for ``lax.scan``
over time; gradients come from native reverse-mode AD (optionally
rematerialized), replacing the reference's custom autograd layers.

Vehicle containers are fixed-capacity rows packed tail->head: slot ``i`` is
directly behind slot ``i+1`` and the live slots are ``0..count-1`` (the
head is slot ``count-1``). Insertions happen only at the tail (shift right),
removals only at the head (count decrement) — exactly the queue discipline
the reference implements with Python list insert/pop
(``_micro_lane.py:53-59``, ``conversion.py:103,192-198``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dhts.models.scene import SceneSpec
from dhts.models.vehicle import VehicleParams, default_params
from dhts.ops import arz, idm

# Virtual-leader defaults for a head vehicle with nothing ahead
# (parity: reference road/lane/_micro_lane.py:14-15).
DEFAULT_HEAD_POSITION_DELTA = 1000.0
DEFAULT_HEAD_SPEED_DELTA = 0.0


class MacroState(NamedTuple):
    """Per-lane ARZ cell arrays + external boundary cells + flux capacitors.

    ``ext_*`` are the user-settable leftmost/rightmost boundary cells used
    when a side has no (macro) neighbor (reference ``_macro_lane.py:59-60,
    156-162``). ``flux_capacitor[l, k]`` accumulates outgoing flux toward
    ``spec.next_lanes[l, k]`` (reference keys a dict by next-lane id,
    ``_macro_lane.py:68,215-225``)."""

    r: jax.Array  # f32[L, C]
    y: jax.Array  # f32[L, C]
    ext_left_r: jax.Array  # f32[L]
    ext_left_u: jax.Array  # f32[L]
    ext_right_r: jax.Array  # f32[L]
    ext_right_u: jax.Array  # f32[L]
    flux_capacitor: jax.Array  # f32[L, K]


class MicroState(NamedTuple):
    """Fixed-capacity per-lane vehicle rows (tail->head packing)."""

    position: jax.Array  # f32[L, V]
    speed: jax.Array  # f32[L, V]
    params: VehicleParams  # each f32[L, V] (incl. ancillary ``a``)
    count: jax.Array  # i32[L] live vehicles per lane
    route: jax.Array  # i32[L, V, R] lane-id sequence, -1 padded
    route_idx: jax.Array  # i32[L, V] cursor into route
    vid: jax.Array  # i32[L, V] global vehicle id (-1 = none)

    @property
    def active(self):
        V = self.position.shape[-1]
        return jnp.arange(V) < self.count[..., None]


class NetworkState(NamedTuple):
    macro: MacroState
    micro: MicroState
    macro_next: jax.Array  # i32[L] MacroRoute next map (-1 = none)
    macro_prev: jax.Array  # i32[L] MacroRoute prev map
    veh_counter: jax.Array  # i32 scalar: ids handed to emitted vehicles
    route_pool: jax.Array  # i32[L, P, R] pre-drawn routes for emissions
    route_pool_cursor: jax.Array  # i32[L]


class StepDiagnostics(NamedTuple):
    """Health signals the reference raises as asserts; inside jit they are
    returned instead (``checkify``-style): CFL (``_macro_lane.py:139-146``),
    collisions (``_micro_lane.py:162,188-192``)."""

    max_wave_speed: jax.Array  # f32[L]: compare against cell_length/dt
    num_collisions: jax.Array  # i32 scalar this step
    emitted: jax.Array  # i32 scalar: vehicles created by macro->micro
    absorbed: jax.Array  # i32 scalar: vehicles removed by micro->macro/none


class BoundaryValues(NamedTuple):
    """Resolved per-step boundary inputs for every lane."""

    left_r: jax.Array  # f32[L] macro ghost cells
    left_u: jax.Array
    right_r: jax.Array
    right_u: jax.Array
    head_position_delta: jax.Array  # f32[L] micro virtual leader
    head_speed_delta: jax.Array


BoundaryFn = Callable[[SceneSpec, NetworkState, bool],
                      tuple[NetworkState, BoundaryValues]]


def tail_insert_rows(x, newval, mask):
    """Masked tail insert on fixed-capacity per-lane rows ``x[L, V, ...]``:
    shift every slot up by one and write ``newval[L, ...]`` at slot 0 where
    ``mask[L]``. The queue-packing primitive shared by vehicle injection
    and the conversion inserts (reference list-insert at index 0,
    ``_micro_lane.py:53-59``)."""
    shifted = jnp.concatenate([newval[:, None, ...], x[:, :-1, ...]], axis=1)
    m = mask.reshape(mask.shape[:1] + (1,) * (x.ndim - 1))
    return jnp.where(m, shifted, x)


def empty_state(spec: SceneSpec, max_vehicles_per_lane: int,
                max_route_length: int, route_pool) -> NetworkState:
    L, C = spec.num_lanes, spec.max_cells
    V, R = max_vehicles_per_lane, max_route_length
    f = lambda *s: jnp.zeros(s, jnp.float32)
    macro = MacroState(
        r=f(L, C), y=f(L, C), ext_left_r=f(L),
        ext_left_u=jnp.full((L,), spec.speed_limit, jnp.float32),
        ext_right_r=f(L),
        ext_right_u=jnp.full((L,), spec.speed_limit, jnp.float32),
        flux_capacitor=f(L, spec.next_lanes.shape[1]))
    micro = MicroState(
        position=f(L, V), speed=f(L, V),
        params=default_params(spec.speed_limit, (L, V)),
        count=jnp.zeros((L,), jnp.int32), route=jnp.full((L, V, R), -1,
                                                         jnp.int32),
        route_idx=jnp.zeros((L, V), jnp.int32),
        vid=jnp.full((L, V), -1, jnp.int32))
    return NetworkState(
        macro=macro, micro=micro,
        macro_next=jnp.full((L,), -1, jnp.int32),
        macro_prev=jnp.full((L,), -1, jnp.int32),
        veh_counter=jnp.zeros((), jnp.int32), route_pool=route_pool,
        route_pool_cursor=jnp.zeros((L,), jnp.int32))


# ---------------------------------------------------------------------------
# state setters (functional; host- or trace-time)
# ---------------------------------------------------------------------------


def set_macro_lane_state(state: NetworkState, lane_id, r, u,
                         spec: SceneSpec) -> NetworkState:
    """Set a macro lane's cells from (density, speed) vectors, padded to C.

    Parity: ``MacroLane.set_state_vector_u`` (``_macro_lane.py:246-263``)."""
    C = spec.max_cells
    n = r.shape[-1]
    r = jnp.pad(r, (0, C - n))
    u = jnp.pad(u, (0, C - n))
    y = arz.compute_y(r, u, spec.speed_limit)
    mac = state.macro
    return state._replace(macro=mac._replace(r=mac.r.at[lane_id].set(r),
                                             y=mac.y.at[lane_id].set(y)))


def set_external_boundary(state: NetworkState, lane_id, left_r=None,
                          left_u=None, right_r=None,
                          right_u=None) -> NetworkState:
    """Set the persistent external ghost cells of a lane (parity:
    ``set_leftmost_cell`` / ``set_rightmost_cell``, ``_macro_lane.py:156-162``)."""
    mac = state.macro
    upd = {}
    if left_r is not None:
        upd["ext_left_r"] = mac.ext_left_r.at[lane_id].set(left_r)
    if left_u is not None:
        upd["ext_left_u"] = mac.ext_left_u.at[lane_id].set(left_u)
    if right_r is not None:
        upd["ext_right_r"] = mac.ext_right_r.at[lane_id].set(right_r)
    if right_u is not None:
        upd["ext_right_u"] = mac.ext_right_u.at[lane_id].set(right_u)
    return state._replace(macro=mac._replace(**upd))


def set_micro_lane_vehicles(state: NetworkState, lane_id, position, speed,
                            routes=None, params: VehicleParams | None = None,
                            spec: SceneSpec | None = None) -> NetworkState:
    """Place ``n`` vehicles on a micro lane (tail->head = ascending position).

    ``position``/``speed``: shape [n]; ``routes``: optional i32[n, R]
    (defaults to the single-lane route ``[lane_id]``). Replaces the lane's
    contents. Parity: ``MicroLane.set_state_vector`` + ``add_vehicle``
    (``_micro_lane.py:61-113,227-239``)."""
    mic = state.micro
    V = mic.position.shape[1]
    R = mic.route.shape[2]
    n = position.shape[-1]
    pad = lambda x, fill: jnp.concatenate(
        [x, jnp.full((V - n,), fill, x.dtype)])
    pos = pad(position.astype(jnp.float32), 0.0)
    spd = pad(speed.astype(jnp.float32), 0.0)
    if routes is None:
        routes = jnp.full((n, R), -1, jnp.int32).at[:, 0].set(lane_id)
    routes = jnp.concatenate(
        [routes, jnp.full((V - n, R), -1, jnp.int32)], axis=0)
    if params is None:
        sl = spec.speed_limit if spec is not None else 30.0
        params = default_params(sl, (n,))
    new_params = jax.tree.map(
        lambda row, full_row: full_row.at[lane_id].set(
            jnp.concatenate([row.astype(jnp.float32),
                             full_row[lane_id, n:]])), params, mic.params)
    vid = pad(jnp.arange(n, dtype=jnp.int32), -1)
    micro = mic._replace(
        position=mic.position.at[lane_id].set(pos),
        speed=mic.speed.at[lane_id].set(spd), params=new_params,
        count=mic.count.at[lane_id].set(n),
        route=mic.route.at[lane_id].set(routes),
        route_idx=mic.route_idx.at[lane_id].set(jnp.zeros(V, jnp.int32)),
        vid=mic.vid.at[lane_id].set(vid))
    return state._replace(micro=micro)


# ---------------------------------------------------------------------------
# boundary resolution
# ---------------------------------------------------------------------------


def macro_cell_u(spec: SceneSpec, mac: MacroState):
    return arz.compute_u(mac.r, mac.y, spec.speed_limit)


def get_macro_boundary(spec: SceneSpec, state: NetworkState, left: bool,
                       u_all=None):
    """Neighbor-edge (density, speed) for every macro lane's left/right side.

    Vectorized parity with ``RoadNetwork.get_macro_boundary``
    (``road_network.py:299-362``): sides with no neighbor use the lane's own
    external boundary cell; exactly one neighbor uses that neighbor
    unconditionally; multiple neighbors resolve through the MacroRoute
    (falling back to the external cell if the route has no entry — the
    reference would fault here); micro neighbors fall back to the external
    cell (micro mass arrives through conversion events instead).
    """
    mac = state.macro
    L = spec.num_lanes
    if u_all is None:
        u_all = macro_cell_u(spec, mac)
    if left:
        num_adj, adj_list, routed = spec.num_prev, spec.prev_lanes, \
            state.macro_prev
        ext_r, ext_u = mac.ext_left_r, mac.ext_left_u
    else:
        num_adj, adj_list, routed = spec.num_next, spec.next_lanes, \
            state.macro_next
        ext_r, ext_u = mac.ext_right_r, mac.ext_right_u

    adj = jnp.where(num_adj == 1, adj_list[:, 0], routed)
    adj_c = jnp.clip(adj, 0, L - 1)
    adj_macro = (adj >= 0) & spec.is_macro[adj_c]
    # left side peeks the neighbor's LAST cell, right side its FIRST
    cell_idx = jnp.clip(spec.num_cell[adj_c] - 1, 0, None) if left else \
        jnp.zeros((L,), jnp.int32)
    nb_r = mac.r[adj_c, cell_idx]
    nb_u = u_all[adj_c, cell_idx]
    use_nb = (num_adj > 0) & adj_macro
    return jnp.where(use_nb, nb_r, ext_r), jnp.where(use_nb, nb_u, ext_u)


def micro_lane_macro_state(spec: SceneSpec, state: NetworkState,
                           differentiable: bool):
    """Aggregate (density, speed) view of every micro lane.

    Vectorized parity with ``RoadNetwork.get_macro_state_of_micro_lane``
    (``road_network.py:207-297``): vehicles on the lane (plus those on
    micro prev-lanes routed here and micro next-lanes routed from here)
    contribute soft membership ``on_this_lane(pos)`` x (length/lane_length)
    to density and membership-weighted speed. Membership is the product of
    two saturating sigmoids in differentiable mode and a hard box test
    otherwise (``_micro_lane.py:303-319``).
    """
    from dhts.ops import dmath

    mic = state.micro
    L, V = mic.position.shape
    lane_len = spec.length[:, None]

    def membership(pos, length_of_lane):
        if differentiable:
            return dmath.soft_sigmoid(pos, 16.0) * dmath.soft_sigmoid(
                length_of_lane - pos, 16.0)
        return ((pos >= 0) & (pos <= length_of_lane)).astype(jnp.float32)

    act = mic.active.astype(jnp.float32)

    # own vehicles
    mem = membership(mic.position, lane_len) * act
    density = jnp.sum(mem * mic.params.length / lane_len, axis=1)
    speed_sum = jnp.sum(mem * mic.speed, axis=1)
    weight = jnp.sum(mem, axis=1)

    # vehicles on micro prev lanes whose route's next lane is this lane:
    # viewed at negative position -(prev_len - pos)
    ar = jnp.arange(L)
    nxt_of = _route_next_lane(mic)  # [L, V]: each vehicle's next lane id
    for adj_k in range(spec.prev_lanes.shape[1]):
        p = spec.prev_lanes[:, adj_k]
        pc = jnp.clip(p, 0, L - 1)
        ok = (p >= 0) & ~spec.is_macro[pc]
        vpos = -(spec.length[pc][:, None] - mic.position[pc])
        sel = (nxt_of[pc] == ar[:, None]) & mic.active[pc] & ok[:, None]
        mem = membership(vpos, lane_len) * sel.astype(jnp.float32)
        density += jnp.sum(mem * mic.params.length[pc] / lane_len, axis=1)
        speed_sum += jnp.sum(mem * mic.speed[pc], axis=1)
        weight += jnp.sum(mem, axis=1)

    # vehicles on micro next lanes whose route's prev lane is this lane:
    # viewed at position lane_len + pos
    prv_of = _route_prev_lane(mic)
    for adj_k in range(spec.next_lanes.shape[1]):
        nx = spec.next_lanes[:, adj_k]
        nc = jnp.clip(nx, 0, L - 1)
        ok = (nx >= 0) & ~spec.is_macro[nc]
        vpos = spec.length[:, None] + mic.position[nc]
        sel = (prv_of[nc] == ar[:, None]) & mic.active[nc] & ok[:, None]
        mem = membership(vpos, lane_len) * sel.astype(jnp.float32)
        density += jnp.sum(mem * mic.params.length[nc] / lane_len, axis=1)
        speed_sum += jnp.sum(mem * mic.speed[nc], axis=1)
        weight += jnp.sum(mem, axis=1)

    density = jnp.minimum(density, 1.0)
    speed = jnp.where(weight > 0, speed_sum / jnp.maximum(weight, 1e-12),
                      spec.speed_limit)
    return density, speed


def _route_next_lane(mic: MicroState):
    """Each vehicle's next lane id along its route (-1 at route end)."""
    V, R = mic.route.shape[1:]
    idx = jnp.clip(mic.route_idx + 1, 0, R - 1)
    nxt = jnp.take_along_axis(mic.route, idx[..., None], axis=2)[..., 0]
    return jnp.where(mic.route_idx + 1 < R, nxt, -1)


def _route_prev_lane(mic: MicroState):
    idx = jnp.clip(mic.route_idx - 1, 0, None)
    prv = jnp.take_along_axis(mic.route, idx[..., None], axis=2)[..., 0]
    return jnp.where(mic.route_idx > 0, prv, -1)


def micro_head_info(spec: SceneSpec, state: NetworkState):
    """Gathered per-lane head-vehicle fields (valid where count > 0)."""
    mic = state.micro
    L, V = mic.position.shape
    ar = jnp.arange(L)
    h = jnp.clip(mic.count - 1, 0, V - 1)
    return dict(
        exists=mic.count > 0, slot=h, position=mic.position[ar, h],
        speed=mic.speed[ar, h], length=mic.params.length[ar, h],
        a=mic.params.a[ar, h], route=mic.route[ar, h],
        route_idx=mic.route_idx[ar, h])


def find_micro_leader(spec: SceneSpec, state: NetworkState):
    """Route-walking virtual-leader search for every micro lane at once.

    Vectorized parity with the *live path* of
    ``RoadNetwork.setup_micro_boundary`` (``road_network.py:429-580``):
    starting from the head vehicle, walk its route; an occupied micro lane
    terminates with that lane's tail vehicle as leader (score 1.0 in the
    reference — the sigmoid-scored multi-candidate branch at
    ``road_network.py:522-523`` is unreachable because candidates are
    restricted to the route's own next lane at ``:508``); a macro lane or
    route end terminates with the default virtual leader; empty micro lanes
    add their length and the walk continues.

    Rather than a sequential walk (a latency chain of R-1 dependent gather
    rounds per simulation step), the whole route window is gathered at once
    and the first terminating position found with an ``argmax`` — one
    parallel pass regardless of route length.
    """
    mic = state.micro
    L, V = mic.position.shape
    R = mic.route.shape[2]
    ar = jnp.arange(L)
    head = micro_head_info(spec, state)

    # window of the R-1 lanes after the current one on each head's route
    offs = jnp.arange(1, R)
    j = head["route_idx"][:, None] + offs[None, :]  # [L, W]
    in_route = j < R
    w = jnp.where(in_route, head["route"][ar[:, None],
                                          jnp.clip(j, 0, R - 1)], -1)
    exists = w >= 0
    wc = jnp.clip(w, 0, L - 1)
    w_macro = exists & spec.is_macro[wc]
    occupied = exists & ~spec.is_macro[wc] & (mic.count[wc] > 0)

    term = ~exists | w_macro | occupied  # first True ends the walk
    any_term = jnp.any(term, axis=1)
    first = jnp.argmax(term, axis=1)  # [L]

    # distance accumulated over the empty micro lanes crossed before [first]
    pass_len = jnp.where(exists & ~term, spec.length[wc], 0.0)
    cum = jnp.concatenate(
        [jnp.zeros((L, 1)), jnp.cumsum(pass_len, axis=1)[:, :-1]], axis=1)
    cur_delta = (spec.length - head["position"] - head["length"] * 0.5 +
                 cum[ar, first])

    lead_lane = wc[ar, first]
    leader_found = head["exists"] & any_term & occupied[ar, first]
    tail_pos = mic.position[lead_lane, 0]
    tail_vel = mic.speed[lead_lane, 0]
    tail_len = mic.params.length[lead_lane, 0]

    pd = jnp.where(leader_found,
                   jnp.maximum(cur_delta + tail_pos - tail_len * 0.5, 0.0),
                   DEFAULT_HEAD_POSITION_DELTA)
    sd = jnp.where(leader_found, head["speed"] - tail_vel,
                   DEFAULT_HEAD_SPEED_DELTA)
    return pd, sd


def default_boundary(spec: SceneSpec, state: NetworkState,
                     differentiable: bool):
    """The reference's ``setup_boundary`` pass for the whole network
    (``road_network.py:187-201``): macro ghost cells from neighbors /
    external cells, micro virtual leaders from the route walk."""
    u_all = macro_cell_u(spec, state.macro)
    left_r, left_u = get_macro_boundary(spec, state, left=True, u_all=u_all)
    right_r, right_u = get_macro_boundary(spec, state, left=False,
                                          u_all=u_all)
    pd, sd = find_micro_leader(spec, state)
    return state, BoundaryValues(left_r=left_r, left_u=left_u,
                                 right_r=right_r, right_u=right_u,
                                 head_position_delta=pd,
                                 head_speed_delta=sd)


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------


def lanes_forward(spec: SceneSpec, state: NetworkState, bv: BoundaryValues,
                  delta_time, skip_micro: bool = False):
    """Advance every lane once (reference ``lane.forward`` +
    ``update_state`` over all lanes, ``road_network.py:99-107``).

    ``skip_micro`` (static) elides the IDM step for scenes the caller knows
    contain no micro lanes."""
    mac, mic = state.macro, state.micro

    # Macro: pad each lane's unused cells with its right-ghost state so the
    # interface at cell index num_cell[l] sees the true right boundary and
    # the padding region is a zero-flux-difference plateau. Then one Godunov
    # update covers all lanes regardless of their individual num_cell.
    right_y = arz.compute_y(bv.right_r, bv.right_u, spec.speed_limit)
    r_pad = jnp.where(spec.cell_mask, mac.r, bv.right_r[:, None])
    y_pad = jnp.where(spec.cell_mask, mac.y, right_y[:, None])
    res = arz.godunov_step(r_pad, y_pad, bv.left_r, bv.left_u, bv.right_r,
                           bv.right_u, spec.speed_limit, delta_time,
                           spec.cell_length)
    keep = spec.cell_mask & spec.is_macro[:, None]
    new_r = jnp.where(keep, res.r, mac.r)
    new_y = jnp.where(keep, res.y, mac.y)

    if skip_micro:
        state = state._replace(macro=mac._replace(r=new_r, y=new_y))
        max_wave = jnp.where(spec.is_macro, res.max_wave_speed, 0.0)
        return state, max_wave, jnp.zeros((), jnp.int32)

    # Micro: one vectorized IDM + Euler step over [L, V]
    p = mic.params
    mres = idm.micro_lane_step(
        mic.position, mic.speed, accel_max=p.accel_max,
        accel_pref=p.accel_pref, target_speed=p.target_speed,
        min_space=p.min_space, time_pref=p.time_pref, length=p.length,
        head_position_delta=bv.head_position_delta,
        head_speed_delta=bv.head_speed_delta, active=mic.active,
        delta_time=delta_time)

    state = state._replace(
        macro=mac._replace(r=new_r, y=new_y),
        micro=mic._replace(position=mres.position, speed=mres.speed))
    max_wave = jnp.where(spec.is_macro, res.max_wave_speed, 0.0)
    return state, max_wave, jnp.sum(mres.collided.astype(jnp.int32))


def network_step(spec: SceneSpec, state: NetworkState, delta_time: float,
                 differentiable: bool,
                 boundary_fn: Optional[BoundaryFn] = None):
    """One full simulation step (parity: ``RoadNetwork.forward``,
    ``road_network.py:79-111``): boundary -> lane forward -> conversion.

    ``differentiable`` is static: it selects soft (sigmoid) vs hard event
    logic in the boundary function, like the reference's flag. Returns
    ``(new_state, StepDiagnostics)``.
    """
    from dhts.models import conversion

    bfn = boundary_fn or default_boundary
    state, bv = bfn(spec, state, differentiable)
    state, max_wave, n_coll = lanes_forward(spec, state, bv, delta_time)
    state, emitted, absorbed = conversion.apply(spec, state, delta_time)
    return state, StepDiagnostics(max_wave_speed=max_wave,
                                  num_collisions=n_coll, emitted=emitted,
                                  absorbed=absorbed)
