"""Hybrid fused-episode forward kernel vs the scan-based env (interpret).

Drives both on identical pre-drawn randomness; rewards and per-step queue
curves must match on a hybrid scene with live injection, emission, transfer
and absorption events.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

CFG = dict(num_intersection=2, num_lane=1, lane_length=10.0,
           speed_limit=20.0, cell_length=5.0, policy_length=6,
           signal_length=2, simulation_frequency=10, random_seed=3,
           max_num_micro_vehicle_per_lane=4, mode="hybrid")


@pytest.mark.parametrize("differentiable", [False, True])
def test_hybrid_fused_forward_matches_scan(differentiable):
    env = ItscpEnv(config=CFG, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    fused = make_fused_itscp_episode(env.spec, env.meta, env.config, V, R, P,
                                     P2, differentiable=differentiable,
                                     interpret=True)
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))  # same draw as env.episode
    n_phases = CFG["policy_length"] // CFG["signal_length"]

    for a in (0.25, 0.7):
        action = jnp.full(env.action_size(), a)
        ref = env.episode(action, differentiable, key)
        reward, queues = fused(action.reshape(n_phases, -1),
                               env.data.schedule, env.data.mroute_next,
                               env.data.mroute_prev, rand,
                               env.data.inj_routes,
                               env.base_state.route_pool)
        assert np.isfinite(float(reward))
        assert float(reward) == pytest.approx(float(ref.reward), rel=2e-3,
                                              abs=2e-3), (a, differentiable)
        np.testing.assert_allclose(np.asarray(queues),
                                   np.asarray(ref.queue_per_step), rtol=5e-3,
                                   atol=1e-4)


def test_hybrid_fused_gradient_matches_scan():
    """Action gradient through the streamed backward kernel vs jax.grad of
    the scan-based env on the same pre-drawn randomness."""
    env = ItscpEnv(config=CFG, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    from dhts.ops.pallas.itscp_hybrid_episode import leader_window
    win = max(leader_window(env.spec.is_macro, env.data.inj_routes),
              leader_window(env.spec.is_macro, env.base_state.route_pool))
    fused = make_fused_itscp_episode(env.spec, env.meta, env.config, V, R, P,
                                     P2, differentiable=True, window=win,
                                     interpret=True)
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    n_phases = CFG["policy_length"] // CFG["signal_length"]
    action = jnp.full(env.action_size(), 0.55)

    g_ref = jax.grad(lambda a: env.episode(a, True, key).reward)(action)
    g_fused = jax.grad(lambda a: fused(a.reshape(n_phases, -1),
                                       env.data.schedule,
                                       env.data.mroute_next,
                                       env.data.mroute_prev, rand,
                                       env.data.inj_routes,
                                       env.base_state.route_pool)[0])(action)
    g_ref = np.asarray(g_ref)
    g_fused = np.asarray(g_fused)
    assert np.all(np.isfinite(g_fused))
    assert np.linalg.norm(g_fused) > 0
    cos = float(np.dot(g_ref, g_fused) /
                (np.linalg.norm(g_ref) * np.linalg.norm(g_fused)))
    assert cos > 0.999, (cos, g_ref, g_fused)
    np.testing.assert_allclose(g_fused, g_ref, rtol=2e-2,
                               atol=2e-3 * np.abs(g_ref).max())


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["hybrid", "micro", "macro"])
def test_env_fused_episode_wiring(mode):
    """config use_fused_episode routes hybrid/micro training episodes
    through the fused kernel with the same randomness as the scan path."""
    cfg = dict(CFG, mode=mode)
    env_scan = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env_scan.reset()
    env_fused = ItscpEnv(config=dict(cfg, use_fused_episode=True),
                         schedule_fn=problem_1)
    env_fused.reset()
    # force interpret mode on CPU: the lazy factory reads the default
    # backend, which conftest pins to cpu -> interpret=True automatically
    key = jax.random.PRNGKey(7)
    action = jnp.full(env_scan.action_size(), 0.6)
    ref = env_scan.episode(action, True, key)
    out = env_fused.episode(action, True, key)
    assert float(out.reward) == pytest.approx(float(ref.reward), rel=2e-3,
                                              abs=2e-3)
    assert int(out.injected) == int(ref.injected)
    assert int(out.emitted) == int(ref.emitted)
    assert int(out.absorbed) == int(ref.absorbed)
    g_ref = np.asarray(jax.grad(
        lambda a: env_scan.episode(a, True, key).reward)(action))
    g_fus = np.asarray(jax.grad(
        lambda a: env_fused.episode(a, True, key).reward)(action))
    assert np.all(np.isfinite(g_fus))
    # a dropped cotangent in the custom VJP would zero g_fus while g_ref
    # stays alive — require matching liveness, then direction
    assert (np.linalg.norm(g_fus) > 0) == (np.linalg.norm(g_ref) > 0)
    denom = np.linalg.norm(g_ref) * np.linalg.norm(g_fus)
    if denom > 0:
        assert float(g_ref @ g_fus) / denom > 0.999
    else:
        assert np.linalg.norm(g_ref) == 0, "both gradients unexpectedly dead"


@pytest.mark.slow
def test_env_fused_episode_vmap():
    """The fused episode vmaps over (action, key) batches exactly (the
    batched-scenario bench path)."""
    cfg = dict(CFG, use_fused_episode=True)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    loss = lambda a, k: -env.episode(a, True, k).reward
    acts = jnp.stack([jnp.full(env.action_size(), v) for v in (0.3, 0.8)])
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    vm = jax.vmap(loss)(acts, keys)
    seq = jnp.stack([loss(a, k) for a, k in zip(acts, keys)])
    np.testing.assert_allclose(np.asarray(vm), np.asarray(seq), rtol=1e-5)


def test_one_step_differential_vs_env_step():
    """Every fused-kernel carry, fed through the env's own
    boundary_and_step, must reproduce the kernel's next carry — the
    step-level parity probe that localized the round-1 kernel bugs."""
    from dhts.apps.control.itscp.env import _make_episode_fn
    from dhts.models.vehicle import VehicleParams
    from dhts.ops.pallas.itscp_hybrid_episode import leader_window
    from dhts.utils import rms

    env = ItscpEnv(config=CFG, schedule_fn=problem_1)
    env.reset()
    spec = env.spec
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    win = max(leader_window(spec.is_macro, env.data.inj_routes),
              leader_window(spec.is_macro, env.base_state.route_pool))
    fused = make_fused_itscp_episode(spec, env.meta, env.config, V, R, P,
                                     P2, differentiable=True, window=win,
                                     interpret=True)
    key = jax.random.PRNGKey(0)
    T, L, C = env.num_timestep, spec.num_lanes, spec.max_cells
    rand = jax.random.uniform(key, (T, L))
    n_phases = CFG["policy_length"] // CFG["signal_length"]
    action = jnp.full(env.action_size(), 0.55)
    tj = {k: np.asarray(v) for k, v in fused.debug_forward(
        action.reshape(n_phases, -1), env.data.schedule,
        env.data.mroute_next, env.data.mroute_prev, rand,
        env.data.inj_routes, env.base_state.route_pool).items()}

    ep = _make_episode_fn(spec, env.meta, env.config, True)
    bstep = jax.jit(ep.boundary_and_step)
    base = env.base_state
    cell_valid = ((np.arange(C)[None] < np.asarray(spec.num_cell)[:, None])
                  & np.asarray(spec.is_macro)[:, None])

    def state_at(t):
        # the kernel does not carry the 6 IDM param planes: every ITSCP
        # vehicle has the default params, so reconstruct them as constants
        from dhts.models.vehicle import default_params
        dp = default_params(spec.speed_limit, (L, V),
                            env.config["vehicle_length"])
        params = VehicleParams(
            accel_max=dp.accel_max, accel_pref=dp.accel_pref,
            target_speed=dp.target_speed, min_space=dp.min_space,
            time_pref=dp.time_pref, length=dp.length,
            a=jnp.asarray(tj["av"][t, :V, :L].T))
        mac = base.macro._replace(
            r=jnp.asarray(tj["r"][t, :C, :L].T),
            y=jnp.asarray(tj["y"][t, :C, :L].T),
            flux_capacitor=jnp.asarray(tj["cap"][t, :, :L].T))
        mic = base.micro._replace(
            position=jnp.asarray(tj["pos"][t, :V, :L].T),
            speed=jnp.asarray(tj["vel"][t, :V, :L].T), params=params,
            count=jnp.asarray(tj["count"][t, 0, :L]),
            route=jnp.asarray(
                np.transpose(tj["route"][t, :V, :, :L], (2, 0, 1))),
            route_idx=jnp.asarray(tj["ridx"][t, :V, :L].T))
        st = base._replace(
            macro=mac, micro=mic,
            macro_next=jnp.asarray(env.data.mroute_next[t]),
            macro_prev=jnp.asarray(env.data.mroute_prev[t]),
            route_pool_cursor=jnp.asarray(tj["cursor"][t, 0, :L]))
        ms = rms.MeanState(jnp.float32(tj["rms"][t, 0, 0]),
                           jnp.float32(tj["rms"][t, 0, 1]))
        msig = rms.MeanState(jnp.float32(tj["rms"][t, 0, 2]),
                             jnp.float32(tj["rms"][t, 0, 3]))
        return st, jnp.asarray(tj["inj_left"][t, 0, :L]), ms, msig

    for t in range(T - 1):
        st, inj_left, ms, msig = state_at(t)
        out = bstep(st, jnp.int32(t), action.reshape(n_phases, -1),
                    jnp.asarray(env.data.schedule[t]), jnp.asarray(rand[t]),
                    jnp.asarray(env.data.inj_routes), inj_left, ms, msig)
        st2, queue = out[0], out[4]
        cnt2 = np.asarray(st2.micro.count)
        np.testing.assert_array_equal(cnt2, tj["count"][t + 1, 0, :L],
                                      err_msg=f"count @t={t}")
        act = np.arange(V)[None] < cnt2[:, None]
        np.testing.assert_allclose(
            np.asarray(st2.macro.r) * cell_valid,
            tj["r"][t + 1, :C, :L].T * cell_valid, atol=5e-5,
            err_msg=f"r @t={t}")
        np.testing.assert_allclose(
            np.asarray(st2.micro.position) * act,
            tj["pos"][t + 1, :V, :L].T * act, atol=5e-5,
            err_msg=f"pos @t={t}")
        np.testing.assert_array_equal(
            np.asarray(st2.micro.route) * act[:, :, None],
            np.transpose(tj["route"][t + 1, :V, :, :L], (2, 0, 1))
            * act[:, :, None], err_msg=f"route @t={t}")
        np.testing.assert_allclose(float(queue), tj["queues"][t], atol=1e-5,
                                   err_msg=f"queue @t={t}")


@pytest.mark.slow
def test_hybrid_fused_gradient_through_emission_events():
    """Event + action-gradient parity on a scene where macro->micro
    EMISSION and micro->macro DEPOSIT actually fire. The 2x2 grid used
    above is all-macro under hybrid mode (no interior intersections), so
    it exercises no vehicle events at all — this 3x3 scene emits 2
    vehicles that are later deposited (plus 4 transfers).

    Note the ancillary-mass gradient carrier (reference conversion.py:62,
    kernel ``emit_carrier``) is verified structurally, not behaviorally:
    its true contribution measures ~1e-9 relative on this scene in BOTH
    the scan env and the kernel, so no tolerance can isolate it — the
    kernel now builds the same carrier by construction."""
    cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=16,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid")
    env_scan = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env_scan.reset()
    env_fused = ItscpEnv(config=dict(cfg, use_fused_episode=True),
                         schedule_fn=problem_1)
    env_fused.reset()
    key = jax.random.PRNGKey(0)
    action = jnp.full(env_scan.action_size(), 0.6)

    ref = env_scan.episode(action, True, key)
    assert int(ref.emitted) >= 2 and int(ref.absorbed) >= 1, \
        "scene no longer emits: regression test is vacuous"
    out = env_fused.episode(action, True, key)
    assert int(out.emitted) == int(ref.emitted)
    assert int(out.absorbed) == int(ref.absorbed)

    g_ref = np.asarray(jax.grad(
        lambda a: env_scan.episode(a, True, key).reward)(action))
    g_fus = np.asarray(jax.grad(
        lambda a: env_fused.episode(a, True, key).reward)(action))
    assert np.all(np.isfinite(g_fus))
    cos = float(np.dot(g_ref, g_fus) /
                (np.linalg.norm(g_ref) * np.linalg.norm(g_fus)))
    assert cos > 0.999, cos
    np.testing.assert_allclose(g_fus, g_ref, rtol=2e-2,
                               atol=2e-3 * np.abs(g_ref).max())


@pytest.mark.slow
def test_packed_episodes_match_vmapped_singles():
    """Episode packing (round-2): B scenarios run block-diagonally in ONE
    kernel's lane axis; rewards/queues/action-gradients must match the
    vmapped single-episode kernels. Tolerances are tight-but-not-exact by
    design: the per-episode RMS/queue reductions run as lane->episode
    one-hot matmuls whose accumulation order differs from the
    single-episode kernel's jnp.sum over a differently-padded lane axis.
    The horizon is long enough that emission/deposit events fire (the
    packed event counters are pack totals)."""
    cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=16,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid",
               use_fused_episode=True)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset_batch(2, seed=5)
    B = 2
    actions = jnp.stack([jnp.full((env.action_size(),), 0.45),
                         jnp.full((env.action_size(),), 0.62)])
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    res_v = env.episode_batch(actions, True, keys)
    run = env.packed_episode_fn()
    res_p = jax.jit(run)(actions, keys)

    rv, rp = np.asarray(res_v.reward), np.asarray(res_p.reward)
    np.testing.assert_allclose(rp, rv, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res_p.queue_per_step),
                               np.asarray(res_v.queue_per_step), atol=1e-5)
    # the scene actually exercises events, and pack totals match
    assert int(np.asarray(res_v.emitted).sum()) > 0
    assert int(res_p.emitted) == int(np.asarray(res_v.emitted).sum())
    assert int(res_p.injected) == int(np.asarray(res_v.injected).sum())
    assert int(res_p.absorbed) == int(np.asarray(res_v.absorbed).sum())

    one = env._fused_episode_one()
    gv = jax.jit(jax.grad(lambda a: jnp.sum(jax.vmap(
        lambda aa, d, k: one(aa, d, k).reward)(
            a, env.batch_data, keys))))(actions)
    gp = jax.jit(jax.grad(lambda a: jnp.sum(run(a, keys).reward)))(actions)
    gv, gp = np.asarray(gv), np.asarray(gp)
    cos = np.sum(gv * gp) / (np.linalg.norm(gv) * np.linalg.norm(gp))
    assert cos > 0.99999, cos
    assert np.max(np.abs(gv - gp)) / np.max(np.abs(gv)) < 1e-4


@pytest.mark.slow
def test_packed_banded_episodes_match_vmapped_singles():
    """Packed episodes at a width where the BANDED gathers engage
    (B=4 x 3x3 -> Lp=640 >= 512): the per-hop-tier banded walk gathers
    (hops 0-1 through the single-band windows, hops 2-3 in the dense
    suffix — the run-split logic) and the banded boundary/arbitration
    families must preserve the packed-vs-vmapped parity contract, with
    live emission events so walks actually run. wide_ops on top must be
    forward-bit-identical, with gradients at the banded wide-vs-narrow
    re-rounding tolerance (see test_banded_5x5_matches_scan)."""
    def build(wide):
        cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
                   speed_limit=20.0, cell_length=5.0, policy_length=16,
                   signal_length=2, simulation_frequency=10, random_seed=3,
                   max_num_micro_vehicle_per_lane=4, mode="hybrid",
                   use_fused_episode=True, use_wide_ops=wide)
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset_batch(4, seed=5)
        return env

    env = build(False)
    B = 4
    actions = jnp.stack([jnp.full((env.action_size(),), 0.3 + 0.1 * b)
                         for b in range(B)])
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    run = env.packed_episode_fn()
    assert run.kernel.banded, "packed 3x3 x4 must take the banded path"

    res_p = jax.jit(run)(actions, keys)
    res_v = env.episode_batch(actions, True, keys)
    rv, rp = np.asarray(res_v.reward), np.asarray(res_p.reward)
    np.testing.assert_allclose(rp, rv, rtol=1e-5)
    assert int(np.asarray(res_v.emitted).sum()) > 0, \
        "no emissions: walks never run and the banded-walk path is vacuous"
    assert int(res_p.emitted) == int(np.asarray(res_v.emitted).sum())
    assert int(res_p.absorbed) == int(np.asarray(res_v.absorbed).sum())

    gp = jax.jit(jax.grad(lambda a: jnp.sum(run(a, keys).reward)))(actions)
    one = env._fused_episode_one()
    gv = jax.jit(jax.grad(lambda a: jnp.sum(jax.vmap(
        lambda aa, d, k: one(aa, d, k).reward)(
            a, env.batch_data, keys))))(actions)
    gv, gp = np.asarray(gv), np.asarray(gp)
    cos = np.sum(gv * gp) / (np.linalg.norm(gv) * np.linalg.norm(gp))
    assert cos > 0.99999, cos
    assert np.max(np.abs(gv - gp)) / np.max(np.abs(gv)) < 1e-4

    # wide_ops on the packed banded kernel: forward bit-identical
    envw = build(True)
    runw = envw.packed_episode_fn()
    assert runw.kernel.wide_ops
    res_w = jax.jit(runw)(actions, keys)
    np.testing.assert_array_equal(np.asarray(res_w.reward), rp)
    np.testing.assert_array_equal(np.asarray(res_w.queue_per_step),
                                  np.asarray(res_p.queue_per_step))
    gw = np.asarray(jax.jit(jax.grad(
        lambda a: jnp.sum(runw(a, keys).reward)))(actions))
    np.testing.assert_allclose(gw, gp, rtol=5e-6,
                               atol=1e-12 * max(np.abs(gp).max(), 1e-30))


@pytest.mark.parametrize("differentiable,mode", [
    (True, "hybrid"),
    pytest.param(False, "hybrid", marks=pytest.mark.slow),
    # micro mode: boundary lanes are micro, so stochastic INJECTIONS fire
    # (hybrid borders are macro and never inject) — this is the live
    # coverage for the saved-injection-flag replay path
    pytest.param(True, "micro", marks=pytest.mark.slow),
])
def test_wide_ops_bit_identical(differentiable, mode):
    """``wide_ops`` (round 3): the walk-latch fold, K-way arbitration
    scan, streamed signal block, stacked sigmoids, fused event reduce and
    f32 pools must be BIT-IDENTICAL to the sequential forms — rewards,
    queue curves, event counters (and action gradients in soft mode) all
    exactly equal on a 3x3 hybrid scene with live
    emission/transfer/deposit events (the scene of
    ``test_hybrid_fused_gradient_through_emission_events``, so both the
    arbitration winners and the leader walk actually matter). Hard mode
    is covered too: the Trainer's eval path runs the hard-mode fused
    kernel."""
    cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=16,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode=mode)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    from dhts.ops.pallas.itscp_hybrid_episode import leader_window
    win = max(leader_window(env.spec.is_macro, env.data.inj_routes),
              leader_window(env.spec.is_macro, env.base_state.route_pool))
    kernels = {
        w: make_fused_itscp_episode(env.spec, env.meta, env.config, V, R,
                                    P, P2, differentiable=differentiable,
                                    window=win, interpret=True, wide_ops=w)
        for w in (False, True)}
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    n_phases = cfg["policy_length"] // cfg["signal_length"]
    action = jnp.full(env.action_size(), 0.6)

    outs, grads = {}, {}
    for w, fused in kernels.items():
        def frun(a, fused=fused):
            return fused(a.reshape(n_phases, -1), env.data.schedule,
                         env.data.mroute_next, env.data.mroute_prev, rand,
                         env.data.inj_routes, env.base_state.route_pool,
                         with_events=True)
        outs[w] = frun(action)
        if differentiable:
            grads[w] = np.asarray(jax.grad(lambda a: frun(a)[0])(action))
    reward, queues, events = outs[False]
    reward_w, queues_w, events_w = outs[True]
    ev_col = 0 if mode == "micro" else 1  # injections / emissions
    assert int(np.asarray(events)[:, ev_col].sum()) >= 2, \
        "scene has no live vehicle events: wide coverage is vacuous"
    assert float(reward_w) == float(reward)
    np.testing.assert_array_equal(np.asarray(queues_w), np.asarray(queues))
    np.testing.assert_array_equal(np.asarray(events_w), np.asarray(events))
    if differentiable:
        # forward values are bitwise equal; the gradient graph XLA fuses
        # differs (merged reduces transpose differently), re-rounding
        # near-zero cotangents at the 1e-20 level — tight allclose
        np.testing.assert_allclose(
            grads[True], grads[False], rtol=5e-6,
            atol=1e-12 * max(np.abs(grads[False]).max(), 1e-30))


@pytest.mark.slow
def test_wide_ops_7x7_hop1_banded_bit_identical():
    """At 7x7 the doubled-band windows fit (win2 < Lp), so wide_ops peels
    walk hop 1 into a banded gather and latches leader fields through it.
    Wide vs narrow kernels must stay exactly equal (rewards, queues,
    events; gradients to fusion-rounding tolerance) with injections
    landing (so walks actually run hops)."""
    cfg = dict(num_intersection=7, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=16,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid")
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    kernels = {
        w: make_fused_itscp_episode(env.spec, env.meta, env.config, V, R,
                                    P, P2, differentiable=True,
                                    window=env._fused_win_needed,
                                    interpret=True, wide_ops=w)
        for w in (False, True)}
    assert kernels[True].banded
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    n_phases = kernels[True].geometry["n_phases"]
    action = jnp.full(env.action_size(), 0.6)

    outs, grads = {}, {}
    for w, fused in kernels.items():
        def frun(a, fused=fused):
            return fused(a.reshape(n_phases, -1), env.data.schedule,
                         env.data.mroute_next, env.data.mroute_prev, rand,
                         env.data.inj_routes, env.base_state.route_pool,
                         with_events=True)
        outs[w] = frun(action)
        grads[w] = np.asarray(jax.grad(lambda a: frun(a)[0])(action))
    reward, queues, events = outs[False]
    reward_w, queues_w, events_w = outs[True]
    assert int(np.asarray(events)[:, 1].sum()) > 0, \
        "no emissions: no vehicles ever walk and the test is vacuous"
    assert float(reward_w) == float(reward)
    np.testing.assert_array_equal(np.asarray(queues_w), np.asarray(queues))
    np.testing.assert_array_equal(np.asarray(events_w), np.asarray(events))
    np.testing.assert_allclose(
        grads[True], grads[False], rtol=5e-6,
        atol=1e-12 * max(np.abs(grads[False]).max(), 1e-30))


@pytest.mark.slow
def test_wide_ops_9x9_hop_peel_bit_identical(monkeypatch):
    """At 9x9 three peel tiers fit (n_hop_peel=2: hops 1-2 peel through
    the 2- and 3-step banded windows on top of hop 0), so the early-exit
    walk loop only runs for walks needing hop 3+. Wide vs narrow kernels
    must stay exactly equal on the forward (rewards, queues, events;
    gradients to fusion-rounding tolerance) with live emissions so walks
    actually run hops. The peel cap is pinned explicitly: since round 5
    it DEFAULTS to 0 under the compact walk (the peeled gathers are
    redundant there) and this test exercises the peel path itself."""
    monkeypatch.setenv("DHTS_PEEL_CAP", "3")
    cfg = dict(num_intersection=9, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=16,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid")
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    kernels = {
        w: make_fused_itscp_episode(env.spec, env.meta, env.config, V, R,
                                    P, P2, differentiable=True,
                                    window=env._fused_win_needed,
                                    interpret=True, wide_ops=w)
        for w in (False, True)}
    assert kernels[True].banded
    assert kernels[True].geometry["n_hop_peel"] == 2
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    n_phases = kernels[True].geometry["n_phases"]
    action = jnp.full(env.action_size(), 0.6)

    outs, grads = {}, {}
    for w, fused in kernels.items():
        def frun(a, fused=fused):
            return fused(a.reshape(n_phases, -1), env.data.schedule,
                         env.data.mroute_next, env.data.mroute_prev, rand,
                         env.data.inj_routes, env.base_state.route_pool,
                         with_events=True)
        outs[w] = frun(action)
        grads[w] = np.asarray(jax.grad(lambda a: frun(a)[0])(action))
    reward, queues, events = outs[False]
    reward_w, queues_w, events_w = outs[True]
    assert int(np.asarray(events)[:, 1].sum()) > 0, \
        "no emissions: no vehicles ever walk and the test is vacuous"
    assert float(reward_w) == float(reward)
    np.testing.assert_array_equal(np.asarray(queues_w), np.asarray(queues))
    np.testing.assert_array_equal(np.asarray(events_w), np.asarray(events))
    np.testing.assert_allclose(
        grads[True], grads[False], rtol=5e-6,
        atol=1e-12 * max(np.abs(grads[False]).max(), 1e-30))


@pytest.mark.slow
def test_banded_5x5_matches_scan():
    """Banded gathers (round 3): at Lp >= 512 the kernel's adjacency-class
    gathers run as chunked block-band dots. Exactness contract: identical
    rewards/queues/events and a matching action gradient vs the scan env
    on a 5x5 hybrid scene with live events. The kernel must actually have
    taken the banded path (fn.banded)."""
    cfg = dict(num_intersection=5, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=18,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid")
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    fused = make_fused_itscp_episode(
        env.spec, env.meta, env.config, V, R, P, P2, differentiable=True,
        window=env._fused_win_needed, interpret=True)
    assert fused.banded, "5x5 must take the banded path"
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    n_phases = fused.geometry["n_phases"]
    action = jnp.full(env.action_size(), 0.55)

    ref = env.episode(action, True, key)
    assert int(ref.emitted) > 0  # events actually fire

    def frun(a):
        return fused(a.reshape(n_phases, -1), env.data.schedule,
                     env.data.mroute_next, env.data.mroute_prev, rand,
                     env.data.inj_routes, env.base_state.route_pool)

    reward, queues = frun(action)
    assert float(reward) == pytest.approx(float(ref.reward), rel=2e-3,
                                          abs=2e-3)
    np.testing.assert_allclose(np.asarray(queues),
                               np.asarray(ref.queue_per_step), rtol=5e-3,
                               atol=1e-4)

    g_f = np.asarray(jax.grad(lambda a: frun(a)[0])(action))
    g_r = np.asarray(jax.grad(
        lambda a: env.episode(a, True, key).reward)(action))
    cos = np.sum(g_f * g_r) / (np.linalg.norm(g_f) * np.linalg.norm(g_r) +
                               1e-30)
    assert cos > 0.9999, cos

    # wide_ops on the banded path (wide arbitration over the prebuilt
    # per-chunk windows; the 5x5 walk takes the early-exit loop, which
    # wide_ops leaves alone) must be bit-identical
    fused_w = make_fused_itscp_episode(
        env.spec, env.meta, env.config, V, R, P, P2, differentiable=True,
        window=env._fused_win_needed, interpret=True, wide_ops=True)
    reward_w, queues_w = fused_w(
        action.reshape(n_phases, -1), env.data.schedule,
        env.data.mroute_next, env.data.mroute_prev, rand,
        env.data.inj_routes, env.base_state.route_pool)
    assert float(reward_w) == float(reward)
    np.testing.assert_array_equal(np.asarray(queues_w), np.asarray(queues))
    g_w = np.asarray(jax.grad(lambda a: fused_w(
        a.reshape(n_phases, -1), env.data.schedule, env.data.mroute_next,
        env.data.mroute_prev, rand, env.data.inj_routes,
        env.base_state.route_pool)[0])(action))
    # The wide rewrite is inside stop_gradient, but it changes the
    # backward-recompute graph XLA fuses, which can re-round unrelated
    # near-zero cotangent components (observed: 2/225 elements off by
    # ~5e-20 abs / 3e-7 rel on CPU). Tight allclose, not bitwise.
    np.testing.assert_allclose(g_w, g_f, rtol=5e-6,
                               atol=1e-12 * max(np.abs(g_f).max(), 1e-30))


@pytest.mark.parametrize("grid", [
    3,
    pytest.param(5, marks=pytest.mark.slow),
])
def test_compact_walk_bit_identical(grid, monkeypatch):
    """Occupancy-compacted walk (round 5): the still-walking lanes are
    packed into <= 128 slot columns and all remaining hops run as one
    wide gather + an [1, 128] latch fold, leaving the dense while_loop
    zero iterations (the 7x7/9x9 scale floor,
    result/merge/walk_trips.json). Compact ON vs OFF must be exactly
    equal — rewards, queue curves, events, and action gradients (the
    walk is stop-gradient and the backward replays saved residuals, so
    even the vjp graph is untouched). Covers the non-banded early-exit
    path (3x3) and the banded + lead_latch + peel path (5x5)."""
    cfg = dict(num_intersection=grid, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0,
               policy_length=16 if grid == 3 else 18,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid")
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    action = jnp.full(env.action_size(), 0.55)

    outs, grads = {}, {}
    for compact in (False, True):
        monkeypatch.setenv("DHTS_COMPACT_WALK", "1" if compact else "0")
        # a larger-than-needed window is always value-safe; >= 8 forces
        # the early-exit walk (the only path the compact phase rides)
        fused = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=max(8, env._fused_win_needed),
            interpret=True, wide_ops=True)
        assert fused.geometry["compact_walk"] == compact
        n_phases = fused.geometry["n_phases"]

        def frun(a, fused=fused, n_phases=n_phases):
            return fused(a.reshape(n_phases, -1), env.data.schedule,
                         env.data.mroute_next, env.data.mroute_prev, rand,
                         env.data.inj_routes, env.base_state.route_pool,
                         with_events=True)

        outs[compact] = frun(action)
        grads[compact] = np.asarray(jax.grad(
            lambda a: frun(a)[0])(action))
    r0, q0, ev0 = outs[False]
    r1, q1, ev1 = outs[True]
    assert int(np.asarray(ev0)[:, 1].sum()) >= 1, \
        "scene has no live emissions: walk coverage is vacuous"
    assert float(r1) == float(r0)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q0))
    np.testing.assert_array_equal(np.asarray(ev1), np.asarray(ev0))
    np.testing.assert_array_equal(grads[True], grads[False])


def test_save_gathers_bit_identical(monkeypatch):
    """Saved replay-gather values (round 5, ``with_saved``): the forward
    streams the boundary/leader/sig/post-arb gather RESULTS per step and
    the backward replay returns them via a custom_vjp whose transpose
    still runs the true gather vjp — so values AND gradients must be
    exactly equal to the live-recompute replay. 5x5 is the smallest
    banded + lead_latch scene (the only path save_gathers rides)."""
    cfg = dict(num_intersection=5, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=18,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid")
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    action = jnp.full(env.action_size(), 0.55)

    outs, grads = {}, {}
    for sg in (False, True):
        monkeypatch.setenv("DHTS_SAVE_GATHERS", "1" if sg else "0")
        fused = make_fused_itscp_episode(
            env.spec, env.meta, env.config, V, R, P, P2,
            differentiable=True, window=max(8, env._fused_win_needed),
            interpret=True, wide_ops=True)
        assert fused.geometry["save_gathers"] == sg
        n_phases = fused.geometry["n_phases"]

        def frun(a, fused=fused, n_phases=n_phases):
            return fused(a.reshape(n_phases, -1), env.data.schedule,
                         env.data.mroute_next, env.data.mroute_prev, rand,
                         env.data.inj_routes, env.base_state.route_pool,
                         with_events=True)

        outs[sg] = frun(action)
        grads[sg] = np.asarray(jax.grad(lambda a: frun(a)[0])(action))
    r0, q0, ev0 = outs[False]
    r1, q1, ev1 = outs[True]
    assert int(np.asarray(ev0)[:, 1].sum()) >= 1, \
        "scene has no live emissions: gather coverage is vacuous"
    assert float(r1) == float(r0)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q0))
    np.testing.assert_array_equal(np.asarray(ev1), np.asarray(ev0))
    # forward values are bit-identical (asserted above); gradients agree
    # to reassociation noise only — with_saved restructures WHERE each
    # gather's cotangent is computed, so the accumulation ORDER into
    # shared rows (sig, pos) legitimately differs (observed max diff
    # 5e-20 absolute on ~1e-17 denormal leak-through components)
    np.testing.assert_allclose(grads[True], grads[False],
                               rtol=1e-5, atol=1e-12)
