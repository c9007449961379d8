"""ITSCP **env-level** parity against the ACTUAL reference ``ItscpEnv``.

Round-1 parity tests stopped at hand-built lane/chain scenes; the ~900
lines of signal/boundary/reward logic in the reference env
(``example/control/itscp/_env.py:586-962``, ``_simulator.py:56-276``) were
only validated dhts-vs-dhts. Here the real reference env is imported (with
local ``tests/refstub`` stand-ins for highway-env/gym, which the reference
uses only for rendering geometry) and BOTH envs run identical deterministic
1x1 scenarios:

* identical grid scene (structural parity asserted lane by lane),
* identical deterministic inflow schedule (shared closed-form formula),
* identical deterministic per-step MacroRoute (shared algorithm over the
  same adjacency lists),
* micro mode: identical deterministic waiting pools, with inflow density
  1.0 on open boundaries so the stochastic injection test ``rand < 1.0``
  always fires — injection timing becomes deterministic and the
  signal-attribution / leader-search logic is isolated,
* the same fixed action vector,

then per-step state trajectories (macro densities / vehicle positions),
per-step stored signals, per-step queue curves, observations, and the
episode reward must agree:

* hard mode (differentiable=False): everything is exact branch logic on
  both sides -> tight tolerances.
* soft mode (differentiable=True): dhts updates the sigmoid-sharpness
  running means once per step with the step's batch of samples, while the
  reference updates them one sample at a time *inside* its per-cell loops
  (documented divergence, env.py module docstring) -> tolerance reflects
  that interleaving difference; the RMS-free quantities stay tight.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
STUB = os.path.join(os.path.dirname(__file__), "refstub")
pytestmark = [
    pytest.mark.slow,  # drives the actual reference torch env
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference repo not mounted"),
]
for p in (REF, STUB):
    if os.path.isdir(p) and p not in sys.path:
        sys.path.insert(0, p)

import jax
import jax.numpy as jnp

from dhts.apps.control.itscp import env as denv

# -- the shared deterministic scenarios --------------------------------------

BASE_CFG = dict(num_intersection=1, num_lane=2, lane_length=20.0,
                speed_limit=20.0, cell_length=5.0, vehicle_length=5.0,
                simulation_frequency=10, policy_length=8, signal_length=2,
                duration=1, static_speed=0.2, num_schedule_obs=10,
                max_num_micro_vehicle_per_lane=4, random_seed=7)
# hybrid: the reference flagship geometry (3x3 grid, 5 m lanes, border
# macro / interior micro) with a horizon long enough for the flux
# capacitor to fill -> macro->micro EMISSION and micro->macro DEPOSIT
# events fire inside the parity window
HYBRID_CFG = dict(BASE_CFG, num_intersection=3, num_lane=1,
                  lane_length=5.0, policy_length=16)
CFG_BY_MODE = {"macro": BASE_CFG, "micro": BASE_CFG, "hybrid": HYBRID_CFG}


def _horizon(mode):
    c = CFG_BY_MODE[mode]
    return c["policy_length"] * c["simulation_frequency"]


def _action(mode):
    """Deterministic action vector; for the 1x1 modes the value 0.65
    deliberately ties the phase-progress grid point 13/20 — the hard
    action-vs-progress gate at that step is decided 1 ulp either way,
    which caught an in-jit reciprocal-multiply division divergence in
    round 2 (see env.signal_progress_table)."""
    if mode != "hybrid":
        return np.array([0.2, 0.8, 0.35, 0.65], np.float32)
    n = 8 * 9  # n_phases * n_inter
    return (0.2 + 0.6 * ((np.arange(n) * 7) % 10) / 9.0).astype(np.float32)


def _sched_val_macro(t, lane_index):
    """Closed-form inflow density: varies by lane and time, in [0.5, 0.95]
    — dense enough that real queues form behind red signals."""
    return 0.5 + 0.45 * ((3 * lane_index + t // 8) % 7) / 6.0


def _sched_val_micro(t, lane_index):
    """Constant 1.0: the injection test ``rand < incoming`` always passes,
    making the stochastic vehicle injection deterministic."""
    return 1.0


SCHED = {"macro": _sched_val_macro, "micro": _sched_val_micro,
         "hybrid": _sched_val_macro}


def _det_macro_route(next_map, is_macro, L, t):
    """Deterministic stand-in for ``create_random_macro_route``
    (reference road_network.py:389-423): same greedy 1:1 matching, with the
    random permutations replaced by a t/lane-rotated scan so both envs pick
    the identical route from identical adjacency lists."""
    nxt = np.full(L, -1, np.int64)
    prv = np.full(L, -1, np.int64)
    for lane_id in range(L):
        if not is_macro[lane_id]:
            continue
        cands = next_map[lane_id]
        for j in range(len(cands)):
            c = cands[(t + lane_id + j) % len(cands)]
            if prv[c] == -1:
                nxt[lane_id] = c
                prv[c] = lane_id
                break
    return nxt, prv


def _det_vehicle_route(next_map, lane_id, pool_idx, max_len):
    """Deterministic forward walk (stand-in for ``create_random_route``,
    road_network.py:604-646): next lane = candidates rotated by
    (lane, pool slot, depth); stops at dead ends or max_len."""
    route = [lane_id]
    cur = lane_id
    for depth in range(max_len - 1):
        cands = next_map[cur]
        if not cands:
            break
        cur = cands[(lane_id + pool_idx + depth) % len(cands)]
        if cur in route:  # no revisits (reference scans past them)
            break
        route.append(cur)
    return route


# -- reference-side driving ---------------------------------------------------

def _make_ref_env(mode):
    from example.control.itscp import _env as ref_env_mod

    sched_val = SCHED[mode]

    def sched_cb(lane_ids, num_timestep):
        return {lid: [sched_val(t, i) for t in range(num_timestep)]
                for i, lid in enumerate(lane_ids)}

    env = ref_env_mod.ItscpEnv(schedule_callback=sched_cb)
    env.config.update(CFG_BY_MODE[mode])
    env.config["mode"] = mode
    env.config["render"] = False
    env.render_eval = False
    obs = env.reset()
    L = len(env.simulator.lane)

    # deterministic per-step MacroRoute from the env's own adjacency lists
    from road.network.route import MacroRoute, MicroRoute
    next_map = {i: list(env.simulator.lane[i].next_lane.keys())
                for i in range(L)}
    is_macro = [env.simulator.lane[i].is_macro() for i in range(L)]
    env.macro_route_schedule.clear()
    for t in range(_horizon(mode)):
        nxt, prv = _det_macro_route(next_map, is_macro, L, t)
        mr = MacroRoute()
        mr.next_lane_dict = {i: int(nxt[i]) for i in range(L) if nxt[i] >= 0}
        mr.prev_lane_dict = {i: int(prv[i]) for i in range(L) if prv[i] >= 0}
        env.macro_route_schedule.append(mr)

    # deterministic waiting pools (micro mode): the reference pops from the
    # END of each list, dhts injects pool index 0 first -> store reversed
    if mode == "micro":
        from road.vehicle.micro_vehicle import MicroVehicle
        P = env.config["max_num_micro_vehicle_per_lane"]
        for lid in range(L):
            routes = [_det_vehicle_route(next_map, lid, p, 32)
                      for p in range(P)]
            env.simulator.lane_waiting_micro_vehicle[lid] = [
                MicroVehicle.default_micro_vehicle(
                    env.config["speed_limit"]) for _ in range(P)][::-1]
            env.simulator.lane_waiting_micro_route[lid] = [
                MicroRoute(list(r)) for r in routes][::-1]

    if mode == "hybrid":
        # macro->micro EMISSION draws its route AT EVENT TIME
        # (conversion.py:72 create_random_route); determinize it with a
        # per-destination-lane counter so dhts's pre-drawn route pool
        # (cursor % P) sees the identical sequence
        counters = {}

        def det_create_random_route(lane_id):
            pidx = counters.get(lane_id, 0)
            counters[lane_id] = pidx + 1
            return MicroRoute(
                _det_vehicle_route(next_map, lane_id, pidx, 32))

        env.simulator.create_random_route = det_create_random_route
    return env, obs


def _run_ref(env, mode, differentiable):
    """Step the reference env T times, recording state/signal/queue."""
    import torch as th

    T = env.num_timestep
    sim = env.simulator
    L = len(sim.lane)
    C = max((l.num_cell for l in sim.lane.values() if l.is_macro()),
            default=1)
    Vmax = 16
    act_np = _action(mode)
    action = th.tensor(act_np) if differentiable else act_np
    env.time = 0
    env.queue_length.clear()
    env.flux.clear()
    env.avg_speed.clear()
    r_hist = np.zeros((T, L, C), np.float64)
    u_hist = np.zeros((T, L, C), np.float64)
    pos_hist = np.full((T, L, Vmax), np.nan)
    vel_hist = np.full((T, L, Vmax), np.nan)
    cnt_hist = np.zeros((T, L), np.int64)
    sig_hist = np.zeros((T, L), np.float64)
    for t in range(T):
        env._simulate_step(action, differentiable)
        for i, lane in sim.lane.items():
            sig_hist[t, i] = float(sim.lane_signal[i])
            if lane.is_macro():
                with th.no_grad():
                    r, y, u = lane.get_state_vector()
                r_hist[t, i, :lane.num_cell] = r.numpy()
                u_hist[t, i, :lane.num_cell] = u.numpy()
            else:
                cnt_hist[t, i] = len(lane.curr_vehicle)
                for vi, v in enumerate(lane.curr_vehicle):
                    p = v.position
                    s = v.speed
                    pos_hist[t, i, vi] = float(p.detach()) if hasattr(
                        p, "detach") else p
                    vel_hist[t, i, vi] = float(s.detach()) if hasattr(
                        s, "detach") else s
    queue = np.zeros((T, L), np.float64)
    for i, lid in enumerate(env.lane.keys()):
        for t in range(T):
            q = env.queue_length[lid][t]
            queue[t, i] = float(q.detach()) if hasattr(q, "detach") else q
    reward = env._reward(action)
    reward = float(reward.detach()) if hasattr(reward, "detach") else reward
    return dict(r=r_hist, u=u_hist, pos=pos_hist, vel=vel_hist,
                cnt=cnt_hist, sig=sig_hist, queue=queue, reward=reward)


# -- dhts-side driving --------------------------------------------------------

def _make_dhts_env(mode):
    sched_val = SCHED[mode]

    def sched_fn(locs, num_timestep, rng):
        Ll = len(locs)
        return np.array([[sched_val(t, l) for l in range(Ll)]
                         for t in range(num_timestep)], np.float32)

    env = denv.ItscpEnv(config=dict(CFG_BY_MODE[mode], mode=mode),
                        schedule_fn=sched_fn)
    obs = env.reset()
    L = env.spec.num_lanes
    is_macro = np.asarray(env.spec.is_macro)
    next_map = env.grid.builder._next
    nxts, prvs = [], []
    for t in range(_horizon(mode)):
        n, p = _det_macro_route(next_map, is_macro, L, t)
        nxts.append(n)
        prvs.append(p)
    data = env.data._replace(
        mroute_next=jnp.asarray(np.stack(nxts), jnp.int32),
        mroute_prev=jnp.asarray(np.stack(prvs), jnp.int32))
    if mode == "micro":
        P = env.config["max_num_micro_vehicle_per_lane"]
        R = env.grid.builder.R
        inj = np.full((L, P, R), -1, np.int32)
        for lid in range(L):
            for p in range(P):
                rt = _det_vehicle_route(next_map, lid, p, 32)[:R]
                inj[lid, p, :len(rt)] = rt
        data = data._replace(inj_routes=jnp.asarray(inj))
    if mode == "hybrid":
        # pre-draw the EMISSION route pool with the same deterministic
        # (lane, ordinal) routes the reference monkeypatch produces
        P2 = env.base_state.route_pool.shape[1]
        R = env.grid.builder.R
        pool = np.full((L, P2, R), -1, np.int32)
        for lid in range(L):
            for pidx in range(P2):
                rt = _det_vehicle_route(next_map, lid, pidx, 32)[:R]
                pool[lid, pidx, :len(rt)] = rt
        env.base_state = env.base_state._replace(
            route_pool=jnp.asarray(pool))
    env.data = data
    return env, obs


def _run_dhts(env, mode, differentiable):
    fn = jax.jit(denv._make_episode_fn(env.spec, env.meta, env.config,
                                       differentiable, record=True))
    res, rec = fn(jnp.asarray(_action(mode)), env.data, env.base_state,
                  jax.random.PRNGKey(0))
    rs, pos, cnt, sigs, flux, avg = (np.asarray(x) for x in rec)
    return res, dict(r=rs, pos=pos, cnt=cnt, sig=sigs, flux=flux, avg=avg)


def _compare_micro_positions(mine, ref, atol):
    """Slot-by-slot vehicle position parity (slot 0 = rearmost in both)."""
    T_, L_ = ref["cnt"].shape
    np.testing.assert_array_equal(mine["cnt"][:, :L_], ref["cnt"],
                                  err_msg="per-lane vehicle counts")
    for t in range(T_):
        for l in range(L_):
            n = ref["cnt"][t, l]
            if n:
                np.testing.assert_allclose(
                    mine["pos"][t, l, :n], ref["pos"][t, l, :n], atol=atol,
                    err_msg=f"vehicle positions t={t} lane={l}")


# -- the tests ----------------------------------------------------------------

@pytest.fixture(scope="module",
                params=["macro", "micro", "hybrid"])
def mode(request):
    return request.param


@pytest.fixture(scope="module")
def envs(mode):
    ref, ref_obs = _make_ref_env(mode)
    mine, my_obs = _make_dhts_env(mode)
    return ref, ref_obs, mine, my_obs


def test_structural_parity(envs):
    """Same lane count, per-lane kind/length/cells, same adjacency lists."""
    ref, _, mine, _ = envs
    L = mine.spec.num_lanes
    assert len(ref.simulator.lane) == L
    for i in range(L):
        rl = ref.simulator.lane[i]
        assert rl.is_macro() == bool(mine.spec.is_macro[i]), i
        assert abs(rl.length - float(mine.spec.length[i])) < 1e-4, i
        if rl.is_macro():
            assert rl.num_cell == int(mine.spec.num_cell[i]), i
        assert list(rl.next_lane.keys()) == mine.grid.builder._next[i], i
        assert list(rl.prev_lane.keys()) == mine.grid.builder._prev[i], i
    assert ref.simulator.vehicle_length == mine.spec.vehicle_length


def test_observation_parity(envs):
    ref, ref_obs, mine, my_obs = envs
    np.testing.assert_allclose(my_obs, ref_obs, atol=1e-6)


def test_hard_mode_parity(envs, mode):
    """Hard (non-differentiable) episode: exact branch logic both sides."""
    ref, _, mine, _ = envs
    r = _run_ref(ref, mode, False)
    res, m = _run_dhts(mine, mode, False)

    np.testing.assert_allclose(m["sig"], r["sig"], atol=1e-6,
                               err_msg="per-step stored lane signals")
    if mode in ("macro", "hybrid"):
        np.testing.assert_allclose(m["r"], r["r"], atol=1e-4,
                                   err_msg="per-step macro densities")
    if mode in ("micro", "hybrid"):
        _compare_micro_positions(m, r, atol=1e-4)
    if mode == "hybrid":
        # the scenario must actually fire conversion events
        assert int(res.emitted) > 0, "no emissions: scenario too short"
    np.testing.assert_allclose(np.asarray(res.queue_per_step),
                               r["queue"].sum(axis=1), rtol=1e-4, atol=1e-6,
                               err_msg="per-step summed squared queue")
    assert abs(float(res.reward) - r["reward"]) <= 1e-4 * max(
        1.0, abs(r["reward"]))


def test_soft_mode_parity(mode):
    """Soft (differentiable) episode: same scenario, training-path logic.

    The RMS-sharpened sigmoid constants are updated with different
    interleaving (per-sample in the reference's Python loops vs per-step
    batch in the dhts scan), so RMS-dependent quantities carry a looser
    tolerance; the RMS-free signals stay tight."""
    ref, _ = _make_ref_env(mode)
    mine, _ = _make_dhts_env(mode)
    r = _run_ref(ref, mode, True)
    res, m = _run_dhts(mine, mode, True)

    np.testing.assert_allclose(m["sig"], r["sig"], atol=1e-5,
                               err_msg="per-step soft lane signals")
    if mode in ("macro", "hybrid"):
        np.testing.assert_allclose(m["r"], r["r"], atol=2e-3,
                                   err_msg="per-step macro densities (soft)")
    if mode in ("micro", "hybrid"):
        # positions feel the signal-RMS constant through the soft
        # head-delta blend; measured drift stays ~1e-3 m over 80 steps
        _compare_micro_positions(m, r, atol=5e-3)
    # measured (macro): max abs queue delta 2.4e-4 at peak queue 0.2
    # (0.12% of peak), entirely from the RMS interleaving; the atol floor
    # covers the near-zero early-episode entries
    np.testing.assert_allclose(np.asarray(res.queue_per_step),
                               r["queue"].sum(axis=1), rtol=2e-2, atol=2e-3,
                               err_msg="per-step soft queue curve")
    assert abs(float(res.reward) - r["reward"]) <= 1e-2 * max(
        1.0, abs(r["reward"])), (float(res.reward), r["reward"])


def test_env_action_gradient_parity_macro():
    """THE end-to-end differentiability check: d(episode reward)/d(action)
    computed by torch autograd through the reference env (80 soft steps of
    dMacroLane custom backwards + soft signal/queue logic) vs jax.grad
    through the dhts episode, on the identical deterministic macro
    scenario. The RMS interleaving divergence bounds the tolerance."""
    import torch as th

    ref, _ = _make_ref_env("macro")
    mine, _ = _make_dhts_env("macro")

    action_t = th.tensor(_action("macro"), requires_grad=True)
    ref.time = 0
    ref.queue_length.clear()
    ref.flux.clear()
    ref.avg_speed.clear()
    for _ in range(_horizon("macro")):
        ref._simulate_step(action_t, True)
    reward_t = ref._reward(action_t)
    reward_t.backward()
    g_ref = action_t.grad.numpy()

    fn = jax.jit(jax.grad(lambda a: denv._make_episode_fn(
        mine.spec, mine.meta, mine.config, True)(
            a, mine.data, mine.base_state, jax.random.PRNGKey(0)).reward))
    # both rewards are already -sum(queue) (reward_queue_c = -1)
    g_mine = np.asarray(fn(jnp.asarray(_action("macro"))))

    cos = np.sum(g_ref * g_mine) / (
        np.linalg.norm(g_ref) * np.linalg.norm(g_mine) + 1e-30)
    assert cos > 0.999, (cos, g_ref, g_mine)
    np.testing.assert_allclose(g_mine, g_ref, rtol=5e-2,
                               atol=1e-3 * np.abs(g_ref).max())


def test_env_action_gradient_parity_hybrid():
    """The crown parity check: action gradients through the FULL hybrid
    episode — flux-capacitor emissions, deposits, transfers, soft signals,
    RMS-sharpened queue — computed by the reference's hand-written
    per-step backwards (torch autograd chain) vs jax.grad through the
    dhts scan episode, on the identical deterministic 3x3 scenario with
    live conversion events. Measured: cosine 1.0, max rel 4.3e-4
    (~60 s: 160 reference steps forward + backward)."""
    import torch as th

    ref, _ = _make_ref_env("hybrid")
    mine, _ = _make_dhts_env("hybrid")

    action_t = th.tensor(_action("hybrid"), requires_grad=True)
    ref.time = 0
    ref.queue_length.clear()
    ref.flux.clear()
    ref.avg_speed.clear()
    for _ in range(_horizon("hybrid")):
        ref._simulate_step(action_t, True)
    ref._reward(action_t).backward()
    g_ref = action_t.grad.numpy()
    assert np.isfinite(g_ref).all()

    fn = jax.jit(jax.grad(lambda a: denv._make_episode_fn(
        mine.spec, mine.meta, mine.config, True)(
            a, mine.data, mine.base_state, jax.random.PRNGKey(0)).reward))
    g_mine = np.asarray(fn(jnp.asarray(_action("hybrid"))))

    cos = np.sum(g_ref * g_mine) / (
        np.linalg.norm(g_ref) * np.linalg.norm(g_mine) + 1e-30)
    assert cos > 0.9999, cos
    np.testing.assert_allclose(g_mine, g_ref, rtol=5e-2,
                               atol=2e-3 * np.abs(g_ref).max())


@pytest.mark.parametrize("fmode", ["macro", "micro"])
def test_flux_avg_speed_history_parity(fmode):
    """The recorder's per-lane flux / avg_speed histories (the reference
    initializes these containers but never fills them, _env.py:119-120;
    dhts records the intended diagnostic, env._lane_flux_speed) must match
    the same quantity recomputed from the reference env's per-step states
    (hard mode: exact branch logic on both sides)."""
    ref_env, _ = _make_ref_env(fmode)
    ref = _run_ref(ref_env, fmode, False)
    env, _ = _make_dhts_env(fmode)
    _, mine = _run_dhts(env, fmode, False)

    L = ref["cnt"].shape[1]
    spec = env.spec
    cell_len = np.asarray(spec.cell_length)
    length = np.asarray(spec.length)
    is_macro = np.asarray(spec.is_macro)
    num_cell = np.asarray(spec.num_cell)
    T = ref["r"].shape[0]
    veh_len = env.config["vehicle_length"]
    flux_ref = np.zeros((T, L))
    avg_ref = np.zeros((T, L))
    for l in range(L):
        if is_macro[l]:
            n = int(num_cell[l])
            flux_ref[:, l] = ((ref["r"][:, l, :n] * ref["u"][:, l, :n])
                              .sum(axis=1) * cell_len[l] / length[l])
            avg_ref[:, l] = ref["u"][:, l, :n].mean(axis=1)
        else:
            for t in range(T):
                n = int(ref["cnt"][t, l])
                if n:
                    flux_ref[t, l] = (np.nansum(ref["vel"][t, l, :n]) *
                                      veh_len / length[l])
                    avg_ref[t, l] = np.nanmean(ref["vel"][t, l, :n])
                else:
                    avg_ref[t, l] = env.config["speed_limit"]
    np.testing.assert_allclose(mine["flux"][:, :L], flux_ref, atol=1e-4)
    np.testing.assert_allclose(mine["avg"][:, :L], avg_ref, atol=1e-4)
