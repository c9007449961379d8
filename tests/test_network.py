"""Network-layer tests: boundary resolution, coupled lanes, hybrid events.

Mirrors the reference's hybrid scene (``example/inverse/hybrid.py:37-82``):
a macro -> micro -> macro chain where vehicles are emitted from the first
lane's flux capacitor, drive across the micro lane, and deposit their mass
into the third lane. Checks event mechanics, mass bookkeeping, ordering
invariants, and end-to-end differentiability of the full network step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.models import conversion, network, scene
from dhts.ops import arz


def hybrid_chain(speed_limit=30.0, num_cell=10, cell_length=5.0, seed=0):
    b = scene.SceneBuilder(speed_limit, max_vehicles_per_lane=16)
    l0 = b.add_macro_lane(num_cell * cell_length, cell_length)
    l1 = b.add_micro_lane(num_cell * cell_length)
    l2 = b.add_macro_lane(num_cell * cell_length, cell_length)
    b.connect(l0, l1)
    b.connect(l1, l2)
    spec, state = b.build(np.random.default_rng(seed))
    mnext, mprev = b.random_macro_route(np.random.default_rng(seed))
    state = state._replace(macro_next=jnp.asarray(mnext),
                           macro_prev=jnp.asarray(mprev))
    return b, spec, state


def rollout(spec, state, dt, steps, differentiable=False):
    def body(s, _):
        return network.network_step(spec, s, dt, differentiable)

    return jax.lax.scan(body, state, None, length=steps)


def test_macro_route_covers_chain():
    b, spec, state = hybrid_chain()
    assert int(state.macro_next[0]) == 1
    # lane 2 has no next lane; lane 1 is micro (no macro_next entry)
    assert int(state.macro_next[2]) == -1
    assert int(state.macro_prev[1]) == 0


def test_emission_and_transit_and_absorption():
    b, spec, state = hybrid_chain()
    dt = 0.02
    # dense, fast traffic on lane 0 so flux accumulates quickly
    state = network.set_macro_lane_state(
        state, 0, jnp.full(10, 0.7), jnp.full(10, 15.0), spec)
    state = network.set_external_boundary(state, 0, left_r=0.7, left_u=15.0)

    final, diags = jax.jit(lambda s: rollout(spec, s, dt, 800))(state)
    emitted = int(jnp.sum(diags.emitted))
    absorbed = int(jnp.sum(diags.absorbed))
    assert emitted >= 2, "flux capacitor never emitted"
    assert absorbed >= 1, "no vehicle absorbed into downstream macro lane"
    # conservation-ish: emitted vehicles are on the lane or absorbed
    assert int(final.micro.count[1]) == emitted - absorbed
    # vehicle ordering invariant: positions ascending within live slots
    cnt = int(final.micro.count[1])
    if cnt >= 2:
        pos = np.asarray(final.micro.position[1, :cnt])
        assert np.all(np.diff(pos) > 0)
    # absorbed mass raised density in lane 2's leading cells at some point
    assert np.all(np.isfinite(np.asarray(final.macro.r)))
    # every step respected CFL
    assert float(jnp.max(diags.max_wave_speed)) * dt < float(
        spec.cell_length[0])


def test_emitted_vehicle_speed_matches_last_cell():
    b, spec, state = hybrid_chain()
    dt = 0.02
    state = network.set_macro_lane_state(
        state, 0, jnp.full(10, 0.7), jnp.full(10, 15.0), spec)
    state = network.set_external_boundary(state, 0, left_r=0.7, left_u=15.0)

    def until_first_emit(state):
        def body(carry):
            s, _ = carry
            s, d = network.network_step(spec, s, dt, False)
            return s, d.emitted

        def cond(carry):
            _, e = carry
            return e == 0

        return jax.lax.while_loop(cond, body, (state, jnp.int32(0)))

    s, _ = jax.jit(until_first_emit)(state)
    assert int(s.micro.count[1]) == 1
    u_last = float(
        network.macro_cell_u(spec, s.macro)[0, int(spec.num_cell[0]) - 1])
    assert float(s.micro.speed[1, 0]) == pytest.approx(u_last, rel=1e-4)
    assert float(s.micro.position[1, 0]) == 0.0
    # ancillary mass equals vehicle length in value
    assert float(s.micro.params.a[1, 0]) == pytest.approx(
        spec.vehicle_length, abs=1e-5)
    # capacitor was decremented by one vehicle length
    assert float(s.macro.flux_capacitor[0, 0]) < spec.vehicle_length


def test_micro_to_micro_transfer():
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=8)
    l0 = b.add_micro_lane(50.0)
    l1 = b.add_micro_lane(50.0)
    b.connect(l0, l1)
    spec, state = b.build(np.random.default_rng(0))
    R = state.micro.route.shape[2]
    routes = jnp.full((2, R), -1, jnp.int32)
    routes = routes.at[:, 0].set(l0).at[:, 1].set(l1)
    state = network.set_micro_lane_vehicles(
        state, l0, jnp.asarray([10.0, 30.0]), jnp.asarray([20.0, 20.0]),
        routes=routes, spec=spec)

    final, diags = jax.jit(lambda s: rollout(spec, s, 0.02, 120))(state)
    # both vehicles crossed onto lane 1 but not yet off its far end
    # (2.4 s at ~20-27 m/s covers 50-60 m)
    assert int(final.micro.count[0]) == 0
    assert int(final.micro.count[1]) == 2
    # route cursor advanced, vids preserved, order preserved
    cnt = 2
    assert np.all(np.asarray(final.micro.route_idx[1, :cnt]) == 1)
    assert set(np.asarray(final.micro.vid[1, :cnt]).tolist()) == {0, 1}
    pos = np.asarray(final.micro.position[1, :cnt])
    assert pos[0] < pos[1]


def test_leader_search_across_lanes():
    """A follower on lane 0 must react to a stopped leader on lane 1."""
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=8)
    l0 = b.add_micro_lane(50.0)
    l1 = b.add_micro_lane(50.0)
    b.connect(l0, l1)
    spec, state = b.build(np.random.default_rng(0))
    R = state.micro.route.shape[2]
    from dhts.models.vehicle import default_params

    r0 = jnp.full((1, R), -1, jnp.int32).at[0, 0].set(l0).at[0, 1].set(l1)
    r1 = jnp.full((1, R), -1, jnp.int32).at[0, 0].set(l1)
    state = network.set_micro_lane_vehicles(
        state, l0, jnp.asarray([40.0]), jnp.asarray([25.0]), routes=r0,
        spec=spec)
    # the leader crawls (tiny target speed) so it stays on lane 1
    crawler = default_params(30.0, (1,))._replace(
        target_speed=jnp.asarray([0.5]))
    state = network.set_micro_lane_vehicles(
        state, l1, jnp.asarray([5.0]), jnp.asarray([0.0]), routes=r1,
        params=crawler, spec=spec)

    # one boundary resolution: lane 0's head must see the stopped vehicle
    # 50 - 40 - 2.5 (own half length) + 5 - 2.5 (leader pos, half length)
    _, bv = network.default_boundary(spec, state, False)
    assert float(bv.head_position_delta[0]) == pytest.approx(10.0, abs=1e-4)
    assert float(bv.head_speed_delta[0]) == pytest.approx(25.0, abs=1e-5)

    # the follower, doing 25 m/s with 10 m of gap, must brake hard and
    # queue behind the crawler without colliding
    final, diags = jax.jit(lambda s: rollout(spec, s, 0.02, 300))(state)
    assert int(jnp.sum(diags.num_collisions)) == 0
    # global front/back positions (lane 1 starts at +50 m)
    offset = jnp.asarray([0.0, 50.0])
    gpos = final.micro.position + offset[:, None]
    cnt0, cnt1 = int(final.micro.count[0]), int(final.micro.count[1])
    assert cnt0 + cnt1 == 2, "a vehicle left the scene unexpectedly"
    # the crawler is always the head (last live slot) of lane 1
    lead_back = float(gpos[1, cnt1 - 1]) - 2.5
    if cnt0 == 1:  # follower still on lane 0
        foll_front = float(gpos[0, 0]) + 2.5
        foll_speed = float(final.micro.speed[0, 0])
    else:  # transferred: tail-inserted at slot 0 behind the crawler
        foll_front = float(gpos[1, 0]) + 2.5
        foll_speed = float(final.micro.speed[1, 0])
    assert foll_front < lead_back, "follower overran its leader"
    assert foll_speed < 5.0, "follower never braked for cross-lane leader"


def test_network_step_differentiable_end_to_end():
    """Gradient of downstream outcome w.r.t. the upstream initial state must
    flow through emission events (the reference's headline capability)."""
    b, spec, state0 = hybrid_chain()
    dt = 0.02

    def loss(r0, u0):
        st = network.set_macro_lane_state(state0, 0, r0, u0, spec)
        st = network.set_external_boundary(st, 0, left_r=0.7, left_u=15.0)
        final, _ = rollout(spec, st, dt, 600, differentiable=True)
        # downstream macro lane's density profile + vehicles' positions
        return (jnp.sum(final.macro.r[2] ** 2) +
                1e-4 * jnp.sum(jnp.where(final.micro.active,
                                         final.micro.position, 0.0) ** 2))

    r0 = jnp.full(10, 0.7)
    u0 = jnp.full(10, 15.0)
    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(r0, u0)
    g = np.concatenate([np.asarray(grads[0]), np.asarray(grads[1])])
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0, "no gradient flowed across hybrid events"
