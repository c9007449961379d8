"""Measure the PyTorch reference's hybrid-network fwd+bwd throughput.

Builds the ITSCP-hybrid benchmark network (3x3 intersections, 1 lane per
arm, 5 m lanes — ``run_itscp_hybrid.sh``) directly from the reference's own
classes (dMacroLane/dMicroLane/ItscpRoadNetwork) — highway-env is only
needed for rendering/geometry in the reference, so the simulation core is
driven here with the same per-step inputs the env would provide (signals,
schedule inflow, per-step random macro routes, waiting pools), then timed
over T differentiable steps plus one backward pass.

Usage: python bench/reference_baseline.py [--t 600] [--reference /root/reference]
Writes nothing; prints steps/sec. The measured number is recorded in
bench.py as REFERENCE_STEPS_PER_SEC with provenance.
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=600)
    ap.add_argument("--reference", type=str, default="/root/reference")
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--lane_length", type=float, default=5.0)
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import numpy as np
    import torch as th

    from example.control.itscp._simulator import ItscpRoadNetwork
    from road.lane.dmacro_lane import dMacroLane
    from road.lane.dmicro_lane import dMicroLane

    # grid geometry equivalent to the env's (only lengths matter to the sim)
    N = args.grid
    speed_limit = 60.0
    cell_length = 5.0
    lane_length = args.lane_length
    outer = (4.0 + 10.0) + 4.0 * (1 - 3 + 0.5)
    straight_len = 2.0 * outer
    net = ItscpRoadNetwork(speed_limit)

    keys = {}

    def add(row, col, loc, approaching, length):
        border = row in (0, N - 1) or col in (0, N - 1)
        lid = len(net.lane)
        if border:
            lane = dMacroLane(lid, length, speed_limit, cell_length)
        else:
            lane = dMicroLane(lid, length, speed_limit)
        net.add_lane(lane)
        keys[(row, col, loc, approaching)] = lid
        return lid

    for row in range(N):
        for col in range(N):
            for loc in ["south", "west", "north", "east"]:
                for app in [True, False]:
                    add(row, col, loc, app, lane_length)
            # connectors: straight + right per approach arm
            for loc, (s_to, r_to) in {
                    "north": ("south", "west"), "south": ("north", "east"),
                    "west": ("east", "south"), "east": ("west", "north"),
            }.items():
                a = keys[(row, col, loc, True)]
                for to, length in ((s_to, straight_len),
                                   (r_to, straight_len * 0.6)):
                    m = add(row, col, f"mid_{loc}_{to}", True, length)
                    net.connect_lane(a, m)
                    net.connect_lane(m, keys[(row, col, to, False)])
    for row in range(N):
        for col in range(N):
            for lane_i in [0]:
                if row > 0:
                    net.connect_lane(keys[(row - 1, col, "south", False)],
                                     keys[(row, col, "north", True)])
                    net.connect_lane(keys[(row, col, "north", False)],
                                     keys[(row - 1, col, "south", True)])
                if col > 0:
                    net.connect_lane(keys[(row, col - 1, "east", False)],
                                     keys[(row, col, "west", True)])
                    net.connect_lane(keys[(row, col, "west", False)],
                                     keys[(row, col - 1, "east", True)])

    rng = np.random.default_rng(0)
    L = len(net.lane)
    print(f"reference network: {L} lanes")

    # waiting pools for micro injection
    for lid, lane in net.lane.items():
        net.lane_waiting_micro_vehicle[lid] = []
        net.lane_waiting_micro_route[lid] = []
        if lane.is_micro():
            for _ in range(10):
                v, r = net.create_default_vehicle_with_random_route(lid)
                net.lane_waiting_micro_vehicle[lid].append(v)
                net.lane_waiting_micro_route[lid].append(r)

    # seed dense initial state on macro lanes, via a leaf tensor for backward
    seed_tensors = []
    for lid, lane in net.lane.items():
        if lane.is_macro():
            r = th.rand(lane.num_cell, requires_grad=True)
            u = th.rand(lane.num_cell, requires_grad=True) * speed_limit
            seed_tensors.append(r)
            lane.set_state_vector_u(r * 0.8 + 0.1, u)

    T = args.t
    dt = 1.0 / 30.0
    schedules = rng.random((T, L)).astype(np.float32)
    t0 = time.perf_counter()
    for t in range(T):
        net.macro_route = net.create_random_macro_route()
        for lid, lane in net.lane.items():
            sig = 1.0 if (t // 120 + lid) % 2 == 0 else 0.0
            net.lane_signal[lid] = th.tensor(sig)
            net.lane_incoming[lid] = float(schedules[t, lid]) if not \
                lane.prev_lane else -1.0
        net.forward(dt, differentiable=True)
    # scalar loss over final state, like the queue reward's dependence
    loss = 0.0
    for lane in net.lane.values():
        if lane.is_macro():
            r, y, u = lane.get_state_vector()
            loss = loss + (r ** 2).sum()
        else:
            for v in lane.curr_vehicle:
                if isinstance(v.speed, th.Tensor):
                    loss = loss + v.speed ** 2
    if isinstance(loss, th.Tensor) and loss.requires_grad:
        loss.backward()
    elapsed = time.perf_counter() - t0
    print(f"T={T} steps fwd+bwd in {elapsed:.2f}s -> "
          f"{T / elapsed:.2f} steps/sec")


if __name__ == "__main__":
    main()
