"""leader_window vectorization parity (round-4 verdict item 7).

The vectorized cumsum form must return the exact value of the original
per-entry loop (max consecutive micro-lane run + 1) for arbitrary route
pools, including empty/padded ones.
"""

import numpy as np

from dhts.ops.pallas.itscp_hybrid_episode import leader_window


def _loop_reference(is_macro, routes):
    is_macro = np.asarray(is_macro).astype(bool)
    entries = np.asarray(routes).reshape(-1, np.asarray(routes).shape[-1])
    micro = np.zeros(entries.shape, bool)
    valid = entries >= 0
    micro[valid] = ~is_macro[entries[valid]]
    best = 0
    for row in micro:
        run = 0
        for m in row:
            run = run + 1 if m else 0
            best = max(best, run)
    return best + 1


def test_leader_window_matches_loop_reference():
    rng = np.random.default_rng(7)
    for _ in range(300):
        L = int(rng.integers(1, 50))
        is_macro = rng.random(L) < rng.random()
        shape = tuple(rng.integers(1, 5, size=int(rng.integers(1, 4))))
        shape = shape + (int(rng.integers(1, 16)),)
        routes = rng.integers(-1, L, size=shape)
        assert leader_window(is_macro, routes) == _loop_reference(
            is_macro, routes)


def test_leader_window_edge_cases():
    # all -1 padding -> no micro runs -> window 1
    assert leader_window(np.array([True, False]),
                         np.full((3, 4), -1)) == 1
    # empty route axis
    assert leader_window(np.array([True]), np.zeros((0, 5), int)) == 1
    # a full-length micro run
    assert leader_window(np.array([False]), np.zeros((1, 6), int)) == 7


def test_leader_window_on_env_pools():
    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1

    cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
               speed_limit=60.0, cell_length=5.0, policy_length=2,
               signal_length=1, simulation_frequency=10, random_seed=0,
               mode="hybrid", max_num_micro_vehicle_per_lane=4)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    for pool in (env.data.inj_routes, env.base_state.route_pool):
        assert leader_window(env.spec.is_macro, pool) == _loop_reference(
            env.spec.is_macro, pool)
