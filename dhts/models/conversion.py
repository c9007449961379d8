"""Hybrid macro<->micro coupling as masked dense events.

TPU redesign of the reference's ``Conversion`` pass
(``road/network/conversion.py:8-215``), which mutates Python lists per lane:

* **macro -> micro** (emission): each macro lane whose MacroRoute successor
  is micro accumulates outgoing flux ``r_last * u_last * dt`` into a per-
  (lane, successor) flux capacitor; when the (detached) capacitor reaches one
  vehicle length and the successor has free entering space, a vehicle is
  emitted at position 0 with the last cell's speed. Gradient flows through
  the emitted vehicle's ancillary mass ``a`` (a straight-through carrier of
  the capacitor) while the capacitor itself is decremented *detached* —
  exactly the reference's trick (``conversion.py:30-73``).
* **micro -> macro** (absorption): a head vehicle one vehicle-length past its
  lane end is removed and its mass ``a / length`` deposited into the
  successor macro lane's overlapping leading cells with a straight-through
  clamp on density; cell speed becomes the vehicle speed
  (``conversion.py:76-171``).
* **micro -> micro** (transfer): a head vehicle past the lane end moves to
  the successor's tail with position reduced by the lane length and its
  route cursor advanced (``conversion.py:174-200``).
* **micro -> none**: past the end with no successor -> leaves the network
  (``conversion.py:202-215``).

All four are evaluated for every lane simultaneously as masked gather/
scatter on the fixed-capacity vehicle rows. Because several source lanes
could insert into the same destination in one step, inserts are arbitrated
to one-per-destination-per-step (lowest source lane id wins, mirroring the
reference's lane-id iteration order); a losing source simply retries next
step — its trigger condition persists. Same for simultaneous deposits into
one macro lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dhts.models import network as net
from dhts.models.scene import SceneSpec
from dhts.models.vehicle import default_params
from dhts.ops import arz
from dhts.ops.dmath import detached, grad_carrier, st_clip


def apply(spec: SceneSpec, state: "net.NetworkState", delta_time):
    """Run the conversion pass; returns ``(state, emitted, absorbed)``."""
    mac, mic = state.macro, state.micro
    L, C = spec.num_lanes, spec.max_cells
    V = mic.position.shape[1]
    R = mic.route.shape[2]
    P = state.route_pool.shape[1]
    ar = jnp.arange(L)
    INF = jnp.int32(L)
    veh_len = spec.vehicle_length
    u_all = net.macro_cell_u(spec, mac)

    # ---------------- 1. flux-capacitor accumulation (macro sources) -----
    mn = state.macro_next
    mn_c = jnp.clip(mn, 0, L - 1)
    macro_src = spec.is_macro & (mn >= 0)
    next_is_micro = macro_src & ~spec.is_macro[mn_c]
    last = jnp.clip(spec.num_cell - 1, 0, C - 1)
    r_last = mac.r[ar, last]
    u_last = u_all[ar, last]
    inc = jnp.where(next_is_micro, r_last * u_last * delta_time, 0.0)
    # capacitor slot k of the routed successor in the adjacency list
    slot = jnp.argmax(spec.next_lanes == mn[:, None], axis=1)
    cap = mac.flux_capacitor.at[ar, slot].add(inc)
    cap_val = cap[ar, slot]

    # ---------------- 2. emission requests -------------------------------
    dest_count = mic.count[mn_c]
    free_space = jnp.where(dest_count > 0,
                           mic.position[mn_c, 0] -
                           0.5 * mic.params.length[mn_c, 0],
                           spec.length[mn_c])
    want_emit = (next_is_micro & (detached(cap_val) >= veh_len) &
                 (free_space >= veh_len) & (dest_count < V))

    # ---------------- 3. micro head-exit requests -------------------------
    head = net.micro_head_info(spec, state)
    h_exists = head["exists"]
    # head's next lane along its route (-1 at the end)
    j = jnp.clip(head["route_idx"] + 1, 0, R - 1)
    hnext = head["route"][ar, j]
    hnext = jnp.where(head["route_idx"] + 1 < R, hnext, -1)
    hn_c = jnp.clip(hnext, 0, L - 1)

    past_end = h_exists & (head["position"] >= spec.length)
    exit_none = past_end & (hnext < 0)
    nxt_micro = (hnext >= 0) & ~spec.is_macro[hn_c]
    nxt_macro = (hnext >= 0) & spec.is_macro[hn_c]
    want_transfer = past_end & nxt_micro & (mic.count[hn_c] < V)
    # absorption waits until the vehicle is a full length past the end
    # (reference conversion.py:99)
    want_deposit = (h_exists & nxt_macro &
                    (head["position"] > spec.length + head["length"]))

    # ---------------- 4. arbitration: one insert per destination ----------
    # Every insert source is a graph predecessor of its destination (macro
    # routes and vehicle routes both follow next_lanes edges), so instead of
    # a scatter-min over all lanes the winner is a min over each lane's
    # bounded predecessor list — a small gather, TPU-friendly.
    prev = spec.prev_lanes  # [L, K]
    pc = jnp.clip(prev, 0, L - 1)
    prev_valid = prev >= 0
    cand_emit = prev_valid & want_emit[pc] & (mn_c[pc] == ar[:, None])
    cand_tr = prev_valid & want_transfer[pc] & (hn_c[pc] == ar[:, None])
    cand_score = jnp.where(cand_emit | cand_tr, pc, INF)
    best = jnp.min(cand_score, axis=1).astype(jnp.int32)  # [L]
    emit_win = want_emit & (best[mn_c] == ar)
    tr_win = want_transfer & (best[hn_c] == ar)

    cand_dep = prev_valid & want_deposit[pc] & (hn_c[pc] == ar[:, None])
    dep_best = jnp.min(jnp.where(cand_dep, pc, INF), axis=1).astype(jnp.int32)
    dep_win = want_deposit & (dep_best[hn_c] == ar)

    # ---------------- 5. removals (head pops) ----------------------------
    remove = exit_none | dep_win | tr_win
    count_after_remove = mic.count - remove.astype(jnp.int32)

    # ---------------- 6. capacitor decrement on emission ------------------
    # value side detaches entirely; the gradient continues only through the
    # emitted vehicle's ancillary ``a`` (reference conversion.py:62-68)
    cap_after = jnp.where(emit_win, detached(cap_val - veh_len), cap_val)
    cap = cap.at[ar, slot].set(cap_after)

    # ---------------- 7. inserts (tail pushes) ----------------------------
    has_insert = best < INF
    src = jnp.clip(best, 0, L - 1)
    is_emit = has_insert & spec.is_macro[src]  # else it is a transfer

    src_slot = head["slot"][src]
    g = lambda x: x[src, src_slot]  # gather a [L, V] field at source heads

    defaults = default_params(spec.speed_limit, (L,), veh_len)
    emit_a = grad_carrier(jnp.full((L,), veh_len, jnp.float32), cap_val)[src]

    new_pos = jnp.where(is_emit, 0.0, head["position"][src] -
                        spec.length[src])
    new_vel = jnp.where(is_emit, u_last[src], head["speed"][src])
    new_params = jax.tree.map(
        lambda dflt, srcf: jnp.where(is_emit, dflt, g(srcf)), defaults,
        mic.params)
    new_params = new_params._replace(
        a=jnp.where(is_emit, emit_a, g(mic.params.a)))

    # routes: emission pops the destination lane's pre-drawn pool, transfer
    # carries the vehicle's route with the cursor advanced
    pool_idx = state.route_pool_cursor % P
    pooled_route = state.route_pool[ar, pool_idx]  # [L, R]
    new_route = jnp.where(is_emit[:, None], pooled_route,
                          mic.route[src, src_slot])
    new_route_idx = jnp.where(is_emit, 0, mic.route_idx[src, src_slot] + 1)

    n_emit = jnp.sum(is_emit.astype(jnp.int32))
    emit_rank = jnp.cumsum(is_emit.astype(jnp.int32)) - 1
    new_vid = jnp.where(is_emit, state.veh_counter + emit_rank,
                        mic.vid[src, src_slot])

    def tail_insert(x, newval):
        return net.tail_insert_rows(x, newval, has_insert)

    micro = mic._replace(
        position=tail_insert(mic.position, new_pos),
        speed=tail_insert(mic.speed, new_vel),
        params=jax.tree.map(tail_insert, mic.params, new_params),
        route=tail_insert(mic.route, new_route),
        route_idx=tail_insert(mic.route_idx, new_route_idx),
        vid=tail_insert(mic.vid, new_vid),
        count=count_after_remove + has_insert.astype(jnp.int32))

    cursor = state.route_pool_cursor + is_emit.astype(jnp.int32)

    # ---------------- 8. micro -> macro mass deposits ---------------------
    dep_has = dep_best < INF
    s = jnp.clip(dep_best, 0, L - 1)  # winning source per destination
    v_head = head["position"][s] - spec.length[s]
    v_tail = v_head - head["length"][s]
    cells = jnp.arange(C, dtype=jnp.float32)
    c_tail = cells[None, :] * spec.cell_length[:, None]
    c_head = (cells[None, :] + 1.0) * spec.cell_length[:, None]
    overlap_cells = ((c_head > v_tail[:, None]) & (c_tail < v_head[:, None]) &
                     spec.cell_mask & dep_has[:, None])
    # the reference scans cells from 0 and stops at the first non-overlap
    # (conversion.py:169-171); require contiguity from cell 0
    overlap_cells &= (spec.cell_length > v_tail)[:, None]
    max_head = jnp.maximum(c_head, v_head[:, None])
    min_tail = jnp.minimum(c_tail, v_tail[:, None])
    overlap = (spec.cell_length[:, None] + head["length"][s][:, None] -
               (max_head - min_tail))
    add_r = (head["a"][s][:, None] / detached(head["length"][s])[:, None] *
             (overlap / spec.cell_length[:, None]))
    n_r = st_clip(mac.r + add_r, 1e-5, 1.0 - 1e-5)
    dep_u = jnp.broadcast_to(head["speed"][s][:, None], (L, C))
    new_r = jnp.where(overlap_cells, n_r, mac.r)
    new_y = jnp.where(overlap_cells,
                      arz.compute_y(n_r, dep_u, spec.speed_limit), mac.y)

    macro = mac._replace(r=new_r, y=new_y, flux_capacitor=cap)

    emitted = n_emit
    absorbed = jnp.sum((exit_none | dep_win).astype(jnp.int32))
    state = state._replace(macro=macro, micro=micro,
                           veh_counter=state.veh_counter + n_emit,
                           route_pool_cursor=cursor)
    return state, emitted, absorbed
