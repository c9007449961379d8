"""User-facing imperative API facade: reference-style workflow."""

import jax.numpy as jnp
import pytest
import numpy as np

from dhts.models.api import Network


def test_reference_style_workflow():
    net = Network(speed_limit=30.0)
    l0 = net.add_macro_lane(50.0, 5.0)
    l1 = net.add_micro_lane(50.0)
    l2 = net.add_macro_lane(50.0, 5.0)
    net.connect_lane(l0, l1)
    net.connect_lane(l1, l2)
    net.set_macro_state(l0, jnp.full(10, 0.7), jnp.full(10, 15.0))
    net.set_boundary(l0, left_r=0.7, left_u=15.0)
    net.finalize()

    for _ in range(5):
        diag = net.forward(0.02)
        assert np.isfinite(float(jnp.max(diag.max_wave_speed)))
    diags = net.rollout(0.02, 500)
    assert int(jnp.sum(diags.emitted)) >= 1
    r, y, u = net.macro_state(l2)
    assert r.shape == (10,) and np.all(np.isfinite(np.asarray(u)))
    if net.num_vehicles(l1):
        pos, spd = net.vehicles(l1)
        assert np.all(np.diff(np.asarray(pos)) > 0)


def test_add_vehicles_before_finalize():
    net = Network(speed_limit=30.0)
    l0 = net.add_micro_lane(200.0)
    net.add_vehicles(l0, jnp.asarray([10.0, 40.0]), jnp.asarray([10.0, 12.0]))
    net.finalize()
    assert net.num_vehicles(l0) == 2
    net.rollout(0.02, 50)
    pos, spd = net.vehicles(l0)
    assert float(pos[0]) > 10.0


def test_add_vehicles_rejects_off_graph_route():
    """A route hop that is not a connect() edge can never be taken by the
    transfer arbitration (it scans the destination's predecessor list), so
    the API fails loudly instead of letting the vehicle stall forever."""

    net = Network(speed_limit=30.0)
    a = net.add_micro_lane(30.0)
    b = net.add_micro_lane(30.0)
    c = net.add_micro_lane(30.0)
    net.connect_lane(a, b)
    net.finalize()
    R = net.builder.R
    pad = lambda rt: [rt + [-1] * (R - len(rt))]
    with pytest.raises(ValueError, match="not a lane-graph edge"):
        net.add_vehicles(a, [5.0], [10.0], routes=pad([a, c]))
    # the valid edge is accepted
    net.add_vehicles(a, [5.0], [10.0], routes=pad([a, b]))
