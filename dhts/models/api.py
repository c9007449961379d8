"""Imperative user-facing facade over the functional core.

A user of the reference builds scenes and steps them imperatively::

    net = RoadNetwork(speed_limit)        # road/network/road_network.py:17
    net.add_lane(dMacroLane(...)); net.connect_lane(a, b)
    net.add_vehicle(v, route)
    net.forward(dt, differentiable)

:class:`Network` offers the same workflow on dhts: imperative construction
on the host, then a finalized, jit-cached functional step underneath. All
mutation is functional (`self.state` is replaced, never mutated), so a
`Network` can be snapshotted/restored by assigning ``state`` (or via
:mod:`dhts.utils.checkpoint`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dhts.models import network as net_mod
from dhts.models import scene as scene_mod
from dhts.models.vehicle import VehicleParams
from dhts.ops import arz


class Network:
    """Scene container + per-step orchestrator (reference ``RoadNetwork``)."""

    def __init__(self, speed_limit: float, max_vehicles_per_lane: int = 16,
                 seed: int = 0):
        self.builder = scene_mod.SceneBuilder(
            speed_limit, max_vehicles_per_lane=max_vehicles_per_lane)
        self.speed_limit = float(speed_limit)
        self.rng = np.random.default_rng(seed)
        self.spec = None
        self.state = None
        self._pending = []  # deferred state edits before finalize
        self._step_cache = {}

    # -- construction (reference add_lane/connect_lane, :45-56,175-185) ---

    def add_macro_lane(self, lane_length: float, cell_length: float) -> int:
        self._check_open()
        return self.builder.add_macro_lane(lane_length, cell_length)

    def add_micro_lane(self, lane_length: float) -> int:
        self._check_open()
        return self.builder.add_micro_lane(lane_length)

    def connect_lane(self, prev_id: int, next_id: int):
        self._check_open()
        self.builder.connect(prev_id, next_id)

    def _check_open(self):
        assert self.spec is None, "scene already finalized"

    def finalize(self, random_macro_route: bool = True):
        """Resolve the graph into device arrays; further edits are
        functional state updates."""
        self.spec, self.state = self.builder.build(self.rng)
        if random_macro_route:
            nxt, prv = self.builder.random_macro_route(self.rng)
            self.state = self.state._replace(macro_next=jnp.asarray(nxt),
                                             macro_prev=jnp.asarray(prv))
        for fn in self._pending:
            self.state = fn(self.state)
        self._pending.clear()
        return self

    def _apply(self, fn):
        if self.spec is None:
            self._pending.append(fn)
        else:
            self.state = fn(self.state)

    # -- state setters -----------------------------------------------------

    def set_macro_state(self, lane_id: int, density, speed):
        """Reference ``MacroLane.set_state_vector_u``."""
        density = jnp.asarray(density, jnp.float32)
        speed = jnp.asarray(speed, jnp.float32)
        self._apply(lambda s: net_mod.set_macro_lane_state(
            s, lane_id, density, speed, self.spec))

    def set_boundary(self, lane_id: int, left_r=None, left_u=None,
                     right_r=None, right_u=None):
        """Reference ``set_leftmost_cell`` / ``set_rightmost_cell``."""
        self._apply(lambda s: net_mod.set_external_boundary(
            s, lane_id, left_r, left_u, right_r, right_u))

    def add_vehicles(self, lane_id: int, positions, speeds, routes=None,
                     params: Optional[VehicleParams] = None):
        """Place vehicles on a micro lane (reference ``add_vehicle``;
        ``routes`` defaults to random routes from ``lane_id``).

        Explicit routes are validated against the lane graph: event
        arbitration resolves lane transfers over each destination's
        predecessor list (``conversion.apply``), so a route hop that is
        not a ``connect()`` edge could never be taken — the vehicle would
        stall at the lane end forever. Fail loudly here instead."""
        positions = jnp.asarray(positions, jnp.float32)
        speeds = jnp.asarray(speeds, jnp.float32)
        n = positions.shape[0]
        if routes is None:
            R = self.builder.R
            rows = []
            for _ in range(n):
                rt = self.builder.random_route(lane_id, self.rng)
                rows.append(rt + [-1] * (R - len(rt)))
            routes = jnp.asarray(rows, jnp.int32)
        else:
            routes = jnp.asarray(routes, jnp.int32)
            nxt = np.asarray(self.spec.next_lanes)
            for row in np.asarray(routes):
                hops = [int(x) for x in row if int(x) >= 0]
                for a, b in zip(hops, hops[1:]):
                    if b not in nxt[a]:
                        raise ValueError(
                            f"route hop {a}->{b} is not a lane-graph edge; "
                            f"a vehicle routed this way would stall at the "
                            f"end of lane {a} (successors: "
                            f"{[int(x) for x in nxt[a] if x >= 0]})")
        self._apply(lambda s: net_mod.set_micro_lane_vehicles(
            s, lane_id, positions, speeds, routes=routes, params=params,
            spec=self.spec))

    def set_macro_route(self, next_map, prev_map):
        self._apply(lambda s: s._replace(
            macro_next=jnp.asarray(next_map, jnp.int32),
            macro_prev=jnp.asarray(prev_map, jnp.int32)))

    # -- stepping (reference ``RoadNetwork.forward``, :79-111) -------------

    def forward(self, delta_time: float, differentiable: bool = False):
        assert self.spec is not None, "call finalize() first"
        key = (float(delta_time), bool(differentiable))
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                lambda s: net_mod.network_step(self.spec, s, delta_time,
                                               differentiable))
        self.state, diag = self._step_cache[key](self.state)
        return diag

    def rollout(self, delta_time: float, num_steps: int,
                differentiable: bool = False):
        """Fused multi-step advance (one device program)."""
        assert self.spec is not None, "call finalize() first"
        key = ("roll", float(delta_time), int(num_steps), bool(differentiable))
        if key not in self._step_cache:
            def run(s):
                def body(s, _):
                    s, d = net_mod.network_step(self.spec, s, delta_time,
                                                differentiable)
                    return s, d
                return jax.lax.scan(body, s, None, length=num_steps)

            self._step_cache[key] = jax.jit(run)
        self.state, diags = self._step_cache[key](self.state)
        return diags

    # -- state getters -------------------------------------------------------

    def macro_state(self, lane_id: int):
        """(density, relative flow, speed) vectors of a macro lane
        (reference ``get_state_vector``, ``_macro_lane.py:265-280``)."""
        n = int(self.spec.num_cell[lane_id])
        r = self.state.macro.r[lane_id, :n]
        y = self.state.macro.y[lane_id, :n]
        return r, y, arz.compute_u(r, y, self.speed_limit)

    def vehicles(self, lane_id: int):
        """(positions, speeds) of live vehicles, tail->head (reference
        ``MicroLane.get_state_vector``)."""
        cnt = int(self.state.micro.count[lane_id])
        return (self.state.micro.position[lane_id, :cnt],
                self.state.micro.speed[lane_id, :cnt])

    def num_vehicles(self, lane_id: int) -> int:
        return int(self.state.micro.count[lane_id])


def cell_of(spec, lane_id: int, position) -> int:
    """Index of the cell containing ``position`` on a macro lane
    (reference ``MacroLane.which``, ``_macro_lane.py:149-154``)."""
    import math

    return math.floor(float(position) / float(spec.cell_length[lane_id]))
