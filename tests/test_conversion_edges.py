"""Conversion edge cases: capacity blocking, arbitration retry, free-space
gating, simultaneous remove+insert."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.models import network, scene
from dhts.models.vehicle import default_params


def _roll(spec, state, dt, steps):
    def body(s, _):
        s, d = network.network_step(spec, s, dt, False)
        return s, (d.emitted, d.absorbed)

    return jax.jit(lambda s: jax.lax.scan(body, s, None, length=steps))(state)


def _routes(lane_ids, R):
    row = jnp.full((1, R), -1, jnp.int32)
    for i, l in enumerate(lane_ids):
        row = row.at[0, i].set(l)
    return row


def test_transfer_blocked_by_full_destination_then_retries():
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=2)  # V = 2
    l0 = b.add_micro_lane(30.0)
    l1 = b.add_micro_lane(300.0)
    b.connect(l0, l1)
    spec, state = b.build(np.random.default_rng(0))
    R = state.micro.route.shape[2]
    # dest already full with two fast vehicles that will drive away
    state = network.set_micro_lane_vehicles(
        state, l1, jnp.asarray([50.0, 100.0]), jnp.asarray([25.0, 25.0]),
        routes=jnp.concatenate([_routes([l1], R)] * 2), spec=spec)
    # source head is already past the lane end -> wants to transfer NOW
    state = network.set_micro_lane_vehicles(
        state, l0, jnp.asarray([31.0]), jnp.asarray([20.0]),
        routes=_routes([l0, l1], R), spec=spec)

    s1, _ = network.network_step(spec, state, 0.02, False)
    # blocked: dest full, vehicle still on l0
    assert int(s1.micro.count[l0]) == 1
    assert int(s1.micro.count[l1]) == 2

    # the leaders exit l1's far end (no next lane) after ~8 s; the blocked
    # transfer then retries successfully. Check mid-flight, before the
    # transferred vehicle itself reaches the far end.
    mid, _ = _roll(spec, s1, 0.02, 450)
    assert int(mid.micro.count[l0]) == 0, "transfer never retried"
    cnt = int(mid.micro.count[l1])
    # the transferred vehicle is the one whose route cursor advanced past
    # the l0 -> l1 hop (l1's pre-loaded vehicles have route_idx 0; vids
    # are per-lane arange and cannot identify it)
    ridx = np.asarray(mid.micro.route_idx[l1, :cnt])
    assert (ridx == 1).sum() == 1, ridx


def test_two_sources_one_destination_arbitrated_then_both_arrive():
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=4)
    a0 = b.add_micro_lane(30.0)
    a1 = b.add_micro_lane(30.0)
    d = b.add_micro_lane(500.0)
    b.connect(a0, d)
    b.connect(a1, d)
    spec, state = b.build(np.random.default_rng(0))
    R = state.micro.route.shape[2]
    # both heads past their lane ends simultaneously
    state = network.set_micro_lane_vehicles(
        state, a0, jnp.asarray([30.5]), jnp.asarray([20.0]),
        routes=_routes([a0, d], R), spec=spec)
    state = network.set_micro_lane_vehicles(
        state, a1, jnp.asarray([30.5]), jnp.asarray([20.0]),
        routes=_routes([a1, d], R), spec=spec)

    s1, _ = network.network_step(spec, state, 0.02, False)
    # one insert per destination per step: lowest source lane id won
    assert int(s1.micro.count[d]) == 1
    assert int(s1.micro.count[a0]) == 0
    assert int(s1.micro.count[a1]) == 1
    s2, _ = network.network_step(spec, s1, 0.02, False)
    assert int(s2.micro.count[d]) == 2
    assert int(s2.micro.count[a1]) == 0
    # order on d: second arrival (from a1) inserted at the tail behind the
    # first; positions ascend
    pos = np.asarray(s2.micro.position[d, :2])
    assert pos[0] < pos[1]


def test_emission_gated_by_free_space():
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=4)
    m = b.add_macro_lane(50.0, 5.0)
    mi = b.add_micro_lane(50.0)
    b.connect(m, mi)
    spec, state = b.build(np.random.default_rng(0))
    R = state.micro.route.shape[2]
    state = state._replace(macro_next=jnp.asarray([mi, -1]),
                           macro_prev=jnp.asarray([-1, m]))
    state = network.set_macro_lane_state(state, m, jnp.full(10, 0.9),
                                         jnp.full(10, 20.0), spec)
    state = network.set_external_boundary(state, m, left_r=0.9, left_u=20.0)
    # pre-load the capacitor beyond a vehicle length
    cap = state.macro.flux_capacitor.at[m, 0].set(20.0)
    state = state._replace(macro=state.macro._replace(flux_capacitor=cap))
    # a parked vehicle at the lane entrance blocks the entering space
    blocker = default_params(30.0, (1,))._replace(
        target_speed=jnp.asarray([0.2]))
    state = network.set_micro_lane_vehicles(
        state, mi, jnp.asarray([1.0]), jnp.asarray([0.0]), params=blocker,
        routes=_routes([mi], R), spec=spec)

    s1, diag = network.network_step(spec, state, 0.02, False)
    assert int(diag.emitted) == 0, "emitted despite no entering free space"
    # remove the blocker -> emission happens immediately
    state2 = network.set_micro_lane_vehicles(
        state, mi, jnp.zeros(0), jnp.zeros(0),
        routes=jnp.zeros((0, R), jnp.int32), spec=spec)
    s2, diag2 = network.network_step(spec, state2, 0.02, False)
    assert int(diag2.emitted) == 1


def test_simultaneous_head_exit_and_tail_insert_same_lane():
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=4)
    l0 = b.add_micro_lane(30.0)
    l1 = b.add_micro_lane(30.0)
    l2 = b.add_micro_lane(300.0)
    b.connect(l0, l1)
    b.connect(l1, l2)
    spec, state = b.build(np.random.default_rng(0))
    R = state.micro.route.shape[2]
    # l1's head is exiting to l2 in the same step l0's head enters l1
    state = network.set_micro_lane_vehicles(
        state, l0, jnp.asarray([30.2]), jnp.asarray([15.0]),
        routes=_routes([l0, l1, l2], R), spec=spec)
    state = network.set_micro_lane_vehicles(
        state, l1, jnp.asarray([30.4]), jnp.asarray([15.0]),
        routes=_routes([l1, l2], R), spec=spec)

    s1, _ = network.network_step(spec, state, 0.02, False)
    assert int(s1.micro.count[l0]) == 0
    assert int(s1.micro.count[l1]) == 1  # lost head, gained tail
    assert int(s1.micro.count[l2]) == 1
    # the vehicle now on l1 is the one from l0 (vid 0 of lane l0's packing)
    assert int(s1.micro.vid[l1, 0]) == 0
    assert float(s1.micro.position[l1, 0]) == pytest.approx(0.2 + 15.0*0.02,
                                                            abs=1e-4)


def test_emission_uses_scene_vehicle_length():
    """A scene with a non-default vehicle_length must emit vehicles whose
    length matches the capacitor threshold (reference pins both to the
    default; dhts scenes may configure it)."""
    b = scene.SceneBuilder(30.0, vehicle_length=4.0, max_vehicles_per_lane=4)
    m = b.add_macro_lane(50.0, 5.0)
    d = b.add_micro_lane(200.0)
    b.connect(m, d)
    spec, state = b.build(np.random.default_rng(0))
    state = state._replace(
        macro_next=jnp.asarray([d, -1], jnp.int32),
        macro_prev=jnp.asarray([-1, m], jnp.int32))
    state = network.set_macro_lane_state(
        state, m, jnp.full(10, 0.4), jnp.full(10, 12.0), spec)
    final, (emitted, _) = _roll(spec, state, 0.05, 200)
    assert int(jnp.sum(emitted)) >= 1, "no emission: test is vacuous"
    cnt = int(final.micro.count[d])
    assert cnt >= 1
    lengths = np.asarray(final.micro.params.length[d, :cnt])
    np.testing.assert_allclose(lengths, 4.0)
    a_vals = np.asarray(final.micro.params.a[d, :cnt])
    # ancillary mass == length up to the (len + cap) - cap rounding the
    # reference itself performs (conversion.py:62)
    np.testing.assert_allclose(a_vals, 4.0, rtol=1e-6)
