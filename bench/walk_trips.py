"""Diagnostic: actual leader-walk while_loop trip counts on live scenes.

The round-4 floor hunt at 7x7/9x9 ended with four fitting pieces of
evidence:

- ablate7 (result/merge/ablate7.json): stubbing the Riemann solve drops
  the 7x7 forward slope 68.2 -> 18.9 us/step;
- probe_riemann (result/merge/probe_riemann.json): the ISOLATED Riemann
  solve costs ~0.3/0.6 us/step at 7x7/9x9 — so the ablation delta is
  KNOCK-ON, not physics cost. The only dynamic-cost structure in the
  fused kernel is the walk while_loop's trip count (everything else is
  branch-free): no flux -> no emissions -> no vehicles -> walks
  terminate at hop 0;
- chunk7 / merge* / peel* (all flat): the banded gather machinery is
  not the binding cost;
- THIS script: with real traffic the per-step MAX hops-to-first-stop is
  20-32 (the W~31 bound) at 7x7/9x9 — one frontmost vehicle with a long
  empty micro route ahead keeps `min(done) < 1` false, so the loop runs
  ~25-31 dense [Lp,Lp] one-hot gather iterations per step (~2 us each =
  the ~49 us ablation delta).

Reference semantics (walk to the first macro lane / occupied micro lane
/ route end — example/control/itscp/_env.py leader search) make long
walks unavoidable for sparse traffic: routes wander the micro interior
for up to R=32 lanes (reference MAX_ROUTE_LENGTH). The round-5 fix is
to TRANSPOSE the occupancy search (extract the ~10-20 occupied lane
ids per step and compare them against route_h [R, Lp] in route
coordinates, with is_macro/length made compare-only via lane
renumbering) so per-step cost scales with #occupied lanes, not with
the walk depth — see docs/RESULTS.md.

Runs the scan env incrementally on CPU and replays the walk stop rule
in numpy at each policy-round boundary.

Usage (CPU): python bench/walk_trips.py [grid ...]
"""

from __future__ import annotations

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1

    grids = [int(g) for g in sys.argv[1:]] or [7, 9]
    for grid in grids:
        cfg = dict(num_intersection=grid, num_lane=1, lane_length=5.0,
                   speed_limit=60.0, cell_length=5.0, policy_length=1,
                   duration=20, signal_length=1, simulation_frequency=30,
                   random_seed=3, mode="hybrid",
                   max_num_micro_vehicle_per_lane=10)
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset()
        is_macro = np.asarray(env.spec.is_macro).astype(bool)
        R = int(env.base_state.micro.route.shape[2])
        trips, nveh, nocc = [], [], []
        for _ in range(20):
            env.step(np.full((grid * grid,), 0.5, np.float32))
            if env._inc is None:
                break
            mic = env._inc["state"].micro
            count = np.asarray(mic.count)
            route = np.asarray(mic.route)
            ridx = np.asarray(mic.route_idx)
            L, V, R = route.shape
            mx = 0
            for lane in range(L):
                c = int(count[lane])
                if c <= 0:
                    continue
                v = c - 1
                cur = int(ridx[lane, v])
                o = 0
                while True:
                    j = cur + 1 + o
                    wl = int(route[lane, v, j]) if 0 <= j < R else -1
                    # the kernel's stop rule (walk_latch): route end,
                    # macro lane, or occupied micro lane
                    if wl < 0 or is_macro[wl] or int(count[wl]) > 0:
                        break
                    o += 1
                mx = max(mx, o + 1)
            trips.append(mx)
            nveh.append(int(count.sum()))
            nocc.append(int(((count > 0) & ~is_macro).sum()))
        print(json.dumps({
            "grid": grid, "R": R, "rounds": len(trips),
            "max_trips_per_round": trips,
            "vehicles_per_round": nveh,
            "occupied_micro_lanes_per_round": nocc,
            "mean_max_trip": (round(float(np.mean(trips)), 1)
                              if trips else None),
            "mean_occupied": (round(float(np.mean(nocc)), 1)
                              if nocc else None),
        }), flush=True)


if __name__ == "__main__":
    main()
