"""Coverage for smaller API surfaces: custom boundary hook, random vehicle
parameters, scene-builder route generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.models import network, scene
from dhts.models.vehicle import random_params
from dhts.ops import arz


def test_custom_boundary_fn_hook():
    """network_step's boundary_fn injects user-controlled ghost cells (the
    reference's bdry_callback seam, _macro_lane.py:70-73)."""
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=4)
    l0 = b.add_macro_lane(50.0, 5.0)
    spec, state = b.build(np.random.default_rng(0))

    def inflow_boundary(spec_, st, differentiable):
        L = spec_.num_lanes
        bv = network.BoundaryValues(
            left_r=jnp.full(L, 0.6), left_u=jnp.full(L, 12.0),
            right_r=jnp.zeros(L), right_u=jnp.full(L, 30.0),
            head_position_delta=jnp.full(L, 1000.0),
            head_speed_delta=jnp.zeros(L))
        return st, bv

    def run(st):
        def body(s, _):
            return network.network_step(spec, s, 0.02, False,
                                        boundary_fn=inflow_boundary)

        return jax.lax.scan(body, st, None, length=200)

    final, _ = jax.jit(run)(state)
    # inflow filled the empty lane from the left
    assert float(final.macro.r[0, 0]) > 0.3
    assert float(jnp.sum(final.macro.r[0])) > 1.0


def test_random_vehicle_params_ranges():
    key = jax.random.PRNGKey(0)
    p = random_params(key, 30.0, (256,))
    for field, lo, hi in [("accel_max", 45.0, 60.0),
                          ("accel_pref", 30.0, 45.0),
                          ("target_speed", 24.0, 36.0),
                          ("min_space", 1.0, 2.0),
                          ("time_pref", 0.2, 0.6)]:
        v = np.asarray(getattr(p, field))
        assert v.min() >= lo - 1e-5 and v.max() <= hi + 1e-5, field
        assert v.std() > 0, field
    np.testing.assert_allclose(np.asarray(p.length), 5.0)
    np.testing.assert_allclose(np.asarray(p.a), 5.0)


def test_builder_random_route_no_revisit():
    b = scene.SceneBuilder(30.0)
    ids = [b.add_micro_lane(10.0) for _ in range(5)]
    # diamond: 0 -> {1, 2} -> 3 -> 4 -> (0: cycle)
    b.connect(ids[0], ids[1])
    b.connect(ids[0], ids[2])
    b.connect(ids[1], ids[3])
    b.connect(ids[2], ids[3])
    b.connect(ids[3], ids[4])
    b.connect(ids[4], ids[0])
    rng = np.random.default_rng(0)
    for _ in range(20):
        rt = b.random_route(0, rng)
        assert rt[0] == 0
        # consecutive lanes are graph edges; once every successor has been
        # visited the walk cycles until MAX_ROUTE_LENGTH, like the reference
        # (road_network.py:631-641)
        assert len(rt) == b.R
        for a_, b_ in zip(rt, rt[1:]):
            assert b_ in b._next[a_]
        # the first lap visits 4 distinct lanes before any revisit
        assert len(set(rt[:4])) == 4

    # a linear chain terminates at the dead end instead of cycling
    b2 = scene.SceneBuilder(30.0)
    c = [b2.add_micro_lane(10.0) for _ in range(3)]
    b2.connect(c[0], c[1])
    b2.connect(c[1], c[2])
    assert b2.random_route(0, np.random.default_rng(0)) == [0, 1, 2]
