"""Numerical parity against the actual PyTorch reference implementation.

These tests import the reference from /root/reference (skipped when absent)
and compare dhts against it on identical instances:

* macro lane: 100-step rollout state parity + gradient of the end-state MSE
  w.r.t. the initial (density, speed) — dhts native AD vs the reference's
  hand-written analytic backward (its headline contribution);
* micro lane: 200-step platoon rollout state parity + gradients;
* hybrid chain: emission timing / vehicle count / absorbed-mass parity.

Target: the north-star gradient parity of 1e-4 (relative, on significant
entries).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from dhts.models import lane as dlane
from dhts.models import network as dnet
from dhts.models import scene as dscene
from dhts.models.vehicle import default_params
from dhts.ops import arz


def _rel_err(a, b, floor=1e-5):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    mask = np.abs(b) > floor
    if not mask.any():
        return 0.0
    return float(np.max(np.abs(a - b)[mask] / np.abs(b)[mask]))


def test_macro_lane_rollout_and_grad_parity():
    import torch as th
    from road.lane.dmacro_lane import dMacroLane

    rng = np.random.default_rng(0)
    C, steps, u_max, dt, dx = 10, 100, 30.0, 0.01, 5.0
    r0 = rng.uniform(0.1, 0.9, C).astype(np.float32)
    u0 = rng.uniform(2.0, 25.0, C).astype(np.float32)
    blr, blu, brr, bru = 0.4, 10.0, 0.2, 18.0

    # ---- reference
    tr = th.tensor(r0, requires_grad=True)
    tu = th.tensor(u0, requires_grad=True)
    ref = dMacroLane(0, C * dx, u_max, dx)
    ref.set_leftmost_cell(blr, blu)
    ref.set_rightmost_cell(brr, bru)
    ref.set_state_vector_u(tr, tu)
    for _ in range(steps):
        ref.forward(dt)
        ref.update_state()
    rr, ry, ru = ref.get_state_vector()
    ref_loss = (rr ** 2).sum() + 1e-3 * (ru ** 2).sum()
    ref_loss.backward()
    ref_r, ref_u = rr.detach().numpy(), ru.detach().numpy()
    ref_gr, ref_gu = tr.grad.numpy(), tu.grad.numpy()

    # ---- dhts
    def loss(r, u):
        res = dlane.macro_rollout(r, u, blr, blu, brr, bru, u_max, dt, dx,
                                  steps)
        return jnp.sum(res.r ** 2) + 1e-3 * jnp.sum(res.u ** 2), (res.r,
                                                                  res.u)

    (val, (our_r, our_u)), (g_r, g_u) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(r0), jnp.asarray(u0))

    assert _rel_err(our_r, ref_r) < 1e-4
    assert _rel_err(our_u, ref_u) < 1e-4
    assert _rel_err(g_r, ref_gr, floor=1e-4) < 1e-3
    assert _rel_err(g_u, ref_gu, floor=1e-6) < 1e-3


def test_micro_lane_rollout_and_grad_parity():
    import torch as th
    from road.lane.dmicro_lane import dMicroLane
    from road.vehicle.micro_vehicle import MicroVehicle

    rng = np.random.default_rng(1)
    n, steps, u_max, dt = 6, 200, 30.0, 0.01
    pos0 = (np.arange(n) * 20.0 + rng.uniform(0, 5, n)).astype(np.float32)
    vel0 = rng.uniform(5.0, 20.0, n).astype(np.float32)

    # ---- reference (default vehicles; lane long enough to hold everyone)
    tp = th.tensor(pos0, requires_grad=True)
    tv = th.tensor(vel0, requires_grad=True)
    ref = dMicroLane(0, 1e7, u_max)
    for i in range(n):
        mv = MicroVehicle.default_micro_vehicle(u_max)
        mv.position = float(pos0[i])
        mv.speed = float(vel0[i])
        mv.id = i
        ref.add_vehicle(mv)
    ref.set_state_vector(tp, tv)
    for _ in range(steps):
        ref.forward(dt)
        ref.update_state()
    rp, rv = ref.get_state_vector()
    ref_loss = (rp ** 2).sum() * 1e-4 + (rv ** 2).sum() * 1e-2
    ref_loss.backward()
    ref_p, ref_v = rp.detach().numpy(), rv.detach().numpy()
    ref_gp, ref_gv = tp.grad.numpy(), tv.grad.numpy()

    # ---- dhts
    params = default_params(u_max, (n,))
    active = jnp.ones(n, bool)

    def loss(p, v):
        res = dlane.micro_rollout(p, v, params, active,
                                  dnet.DEFAULT_HEAD_POSITION_DELTA,
                                  dnet.DEFAULT_HEAD_SPEED_DELTA, dt, steps)
        return (jnp.sum(res.position ** 2) * 1e-4 +
                jnp.sum(res.speed ** 2) * 1e-2), (res.position, res.speed)

    (val, (our_p, our_v)), (g_p, g_v) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(pos0),
                                            jnp.asarray(vel0))

    assert _rel_err(our_p, ref_p) < 1e-4
    assert _rel_err(our_v, ref_v) < 1e-3
    assert _rel_err(g_p, ref_gp, floor=1e-5) < 1e-3
    assert _rel_err(g_v, ref_gv, floor=1e-5) < 1e-3


def test_hybrid_chain_event_parity():
    """Emission/absorption bookkeeping matches the reference on the 3-lane
    macro->micro->macro chain with a fixed macro route."""
    import torch as th
    from road.lane.dmacro_lane import dMacroLane
    from road.lane.dmicro_lane import dMicroLane
    from road.network.road_network import RoadNetwork as RefNet
    from road.network.route import MacroRoute as RefMacroRoute

    C, dx, u_max, dt, steps = 10, 5.0, 30.0, 0.02, 500
    r_init = np.full(C, 0.7, np.float32)
    u_init = np.full(C, 15.0, np.float32)

    # ---- reference
    net = RefNet(u_max)
    ml0 = dMacroLane(0, C * dx, u_max, dx)
    ml0.set_leftmost_cell(0.7, 15.0)
    ml0.set_rightmost_cell(0.0, u_max)
    net.add_lane(ml0)
    mi1 = dMicroLane(1, C * dx, u_max)
    net.add_lane(mi1)
    ml2 = dMacroLane(2, C * dx, u_max, dx)
    ml2.set_leftmost_cell(0.0, u_max)
    ml2.set_rightmost_cell(0.0, u_max)
    net.add_lane(ml2)
    net.connect_lane(0, 1)
    net.connect_lane(1, 2)
    route = RefMacroRoute()
    route.next_lane_dict = {0: 1, 1: 2}
    route.prev_lane_dict = {1: 0, 2: 1}
    net.macro_route = route
    ml0.set_state_vector_u(th.tensor(r_init), th.tensor(u_init))
    ref_counts = []
    for _ in range(steps):
        net.forward(dt, differentiable=False)
        ref_counts.append(mi1.num_vehicle())
    ref_emitted = net.num_vehicle
    ref_on_lane = mi1.num_vehicle()

    # ---- dhts
    b = dscene.SceneBuilder(u_max, max_vehicles_per_lane=32)
    l0 = b.add_macro_lane(C * dx, dx)
    l1 = b.add_micro_lane(C * dx)
    l2 = b.add_macro_lane(C * dx, dx)
    b.connect(l0, l1)
    b.connect(l1, l2)
    spec, state = b.build(np.random.default_rng(0))
    state = state._replace(
        macro_next=jnp.asarray([1, 2, -1]), macro_prev=jnp.asarray([-1, 0,
                                                                    1]))
    state = dnet.set_external_boundary(state, 0, left_r=0.7, left_u=15.0,
                                       right_r=0.0, right_u=u_max)
    state = dnet.set_macro_lane_state(state, 0, jnp.asarray(r_init),
                                      jnp.asarray(u_init), spec)

    def body(s, _):
        s, d = dnet.network_step(spec, s, dt, False)
        return s, (d.emitted, d.absorbed)

    final, (em, ab) = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=steps))(state)
    our_emitted = int(jnp.sum(em))
    our_on_lane = int(final.micro.count[1])

    # event counts must agree closely (float32 capacitor accumulation order
    # differs, so allow off-by-one on the emission tally)
    assert abs(our_emitted - ref_emitted) <= 1, (our_emitted, ref_emitted)
    assert abs(our_on_lane - ref_on_lane) <= 1, (our_on_lane, ref_on_lane)


def test_hybrid_gradient_parity_through_events():
    """d(downstream outcome)/d(upstream initial state) THROUGH emission/
    absorption events: reference torch autograd (ancillary-a + detach
    tricks) vs dhts native AD (straight-through combinators)."""
    import torch as th
    from road.lane.dmacro_lane import dMacroLane
    from road.lane.dmicro_lane import dMicroLane
    from road.network.road_network import RoadNetwork as RefNet
    from road.network.route import MacroRoute as RefMacroRoute

    C, dx, u_max, dt, steps = 10, 5.0, 30.0, 0.02, 400
    r_init = np.full(C, 0.7, np.float32)
    u_init = np.full(C, 15.0, np.float32)

    net = RefNet(u_max)
    ml0 = dMacroLane(0, C * dx, u_max, dx)
    ml0.set_leftmost_cell(0.7, 15.0)
    ml0.set_rightmost_cell(0.0, u_max)
    net.add_lane(ml0)
    mi1 = dMicroLane(1, C * dx, u_max)
    net.add_lane(mi1)
    ml2 = dMacroLane(2, C * dx, u_max, dx)
    ml2.set_leftmost_cell(0.0, u_max)
    ml2.set_rightmost_cell(0.0, u_max)
    net.add_lane(ml2)
    net.connect_lane(0, 1)
    net.connect_lane(1, 2)
    rt = RefMacroRoute()
    rt.next_lane_dict = {0: 1, 1: 2}
    rt.prev_lane_dict = {1: 0, 2: 1}
    net.macro_route = rt
    tr = th.tensor(r_init, requires_grad=True)
    tu = th.tensor(u_init, requires_grad=True)
    ml0.set_state_vector_u(tr, tu)
    for _ in range(steps):
        net.forward(dt, differentiable=True)
    r2, _, _ = ml2.get_state_vector()
    loss = (r2 ** 2).sum()
    for v in mi1.curr_vehicle:
        if isinstance(v.position, th.Tensor):
            loss = loss + 1e-4 * v.position ** 2
        if isinstance(v.speed, th.Tensor):
            loss = loss + 1e-2 * v.speed ** 2
    loss.backward()
    ref_loss = float(loss.detach())
    ref_gr, ref_gu = tr.grad.numpy(), tu.grad.numpy()

    b = dscene.SceneBuilder(u_max, max_vehicles_per_lane=32)
    l0 = b.add_macro_lane(C * dx, dx)
    l1 = b.add_micro_lane(C * dx)
    l2 = b.add_macro_lane(C * dx, dx)
    b.connect(l0, l1)
    b.connect(l1, l2)
    spec, state0 = b.build(np.random.default_rng(0))
    state0 = state0._replace(macro_next=jnp.asarray([1, 2, -1]),
                             macro_prev=jnp.asarray([-1, 0, 1]))
    state0 = dnet.set_external_boundary(state0, 0, left_r=0.7, left_u=15.0,
                                        right_r=0.0, right_u=u_max)
    state0 = dnet.set_external_boundary(state0, 2, left_r=0.0, left_u=u_max,
                                        right_r=0.0, right_u=u_max)

    def loss_fn(r, u):
        st = dnet.set_macro_lane_state(state0, 0, r, u, spec)

        def body(s, _):
            s, _d = dnet.network_step(spec, s, dt, True)
            return s, None

        final, _ = jax.lax.scan(body, st, None, length=steps)
        act = final.micro.active
        return (jnp.sum(final.macro.r[2, :C] ** 2) +
                1e-4 * jnp.sum(jnp.where(act, final.micro.position, 0.0)**2) +
                1e-2 * jnp.sum(jnp.where(act, final.micro.speed, 0.0)**2))

    val, (g_r, g_u) = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))(
        jnp.asarray(r_init), jnp.asarray(u_init))

    assert abs(float(val) - ref_loss) / abs(ref_loss) < 1e-5
    assert _rel_err(g_r, ref_gr, floor=1e-4) < 5e-3
    assert _rel_err(g_u, ref_gu, floor=1e-5) < 5e-4


def test_micro_gd_optimizer_trajectory_parity():
    """Same-instance inverse-micro GD: dhts's Adam-on-scan and the
    reference's Adam-on-taped-rollout must trace the SAME optimization
    trajectory (round-2 audit of the round-1 artifact spread: on a shared
    instance the 100-episode endpoints agreed to 4 digits, 1.703e-3 vs
    1.7015e-3 — the spread was instance luck, not an optimizer bug).

    Shortened here (10 vehicles, 200 steps, 12 episodes) to keep the
    reference's per-episode Python taping affordable in CI."""
    import torch as th
    from road.lane.dmicro_lane import dMicroLane
    from road.vehicle.micro_vehicle import MicroVehicle

    from dhts.apps.inverse.micro import MicroInverseProblem

    n, steps, eps, u_max, dt, vl = 10, 200, 12, 30.0, 0.01, 5.0
    prob = MicroInverseProblem(1, steps, eps, dt, u_max, "parity_tmp", n, vl,
                               log_root="/tmp/dhts_parity")
    rng = np.random.default_rng(123)
    prob.initialize(rng)
    est0 = jax.tree.map(jnp.asarray, prob.random_initial_state(rng))
    _, ends = prob.solve_gd(est0)

    def rollout(p, v):
        lane = dMicroLane(0, 1e10, u_max)
        for i in range(n):
            mv = MicroVehicle.default_micro_vehicle(u_max)
            mv.position = float(p[i].detach())
            mv.speed = float(v[i].detach())
            mv.id = i
            lane.add_vehicle(mv)
        lane.set_state_vector(p, v)
        for _ in range(steps):
            lane.forward(dt)
            lane.update_state()
        return lane.get_state_vector()

    with th.no_grad():
        tgt_p, tgt_v = rollout(th.tensor(np.asarray(prob.true_state[0])),
                               th.tensor(np.asarray(prob.true_state[1])))
    p = th.tensor(np.asarray(est0[0]), requires_grad=True)
    v = th.tensor(np.asarray(est0[1]), requires_grad=True)
    opt = th.optim.Adam([p, v], lr=prob.gd_lr)
    lb_p = th.arange(n) * 4.0 * vl
    ub_p = lb_p + 2.0 * vl
    ref_ends = []
    for _ in range(eps):
        opt.zero_grad()
        ep_p, ep_v = rollout(p, v)
        loss = ((ep_p - tgt_p) ** 2).sum() + ((ep_v - tgt_v) ** 2).sum()
        loss.backward()
        ref_ends.append(float(loss))
        opt.step()
        with th.no_grad():
            p.clamp_(lb_p, ub_p)
            v.clamp_(0.0, u_max)

    ends = np.asarray(ends)
    ref_ends = np.asarray(ref_ends)
    # whole trajectory, not just the endpoint: both Adams see the same
    # gradients and take the same steps
    np.testing.assert_allclose(ends, ref_ends, rtol=2e-3, atol=1e-7,
                               err_msg="per-episode end-error trajectory")
