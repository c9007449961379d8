"""ITSCP environment: a differentiable signal-controlled grid simulation.

Rebuild of the reference's ``ItscpEnv`` + ``ItscpRoadNetwork``
(``example/control/itscp/_env.py:95-962``, ``_simulator.py:20-281``) as one
jitted episode rollout:

* the per-phase **action** (one float per intersection per signal phase) is
  the green split between the WE and NS arms within the phase: an arm's gate
  is a (soft) comparison of the action value against the phase progress
  (reference ``lane_signal_info``, ``_env.py:885-962``);
* **macro lanes** see signal-blended ghost cells — green = upstream state or
  schedule inflow at equilibrium speed, red = a stopped wall downstream /
  vacuum upstream (reference ``_simulator.py:56-137``);
* **micro lanes** stochastically inject vehicles from pre-drawn waiting
  pools at open boundaries and blend green (route leader) vs red (stop at
  lane end) virtual-leader deltas, attributing the governing signal by the
  head vehicle's soft position among prev/current/next lanes with an
  RMS-adaptively sharpened sigmoid (reference ``_simulator.py:139-276``);
* the **reward** is the negative squared soft queue length, where "queued"
  is an RMS-adaptive soft test of speed below ``static_speed`` (reference
  ``_env.py:586-756``).

The running-mean statistics that tune sigmoid sharpness are carried through
the scan as detached ``(sum, count)`` states; they are updated once per step
with the batch of that step's observations (the reference updates them one
sample at a time inside its Python loops — same statistic, different
interleaving; both are fresh per episode because the reference deep-copies
the env per episode, ``trainer.py:172``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dhts.apps.control.itscp import problem as problem_mod
from dhts.apps.control.itscp import scene as grid_scene
from dhts.models import network
from dhts.models.scene import SceneSpec
from dhts.ops import arz
from dhts.ops.dmath import soft_sigmoid
from dhts.utils import rms

# reference example/control/itscp/_env_config.py:1-85
DEFAULT_CONFIG = dict(
    num_intersection=1,
    num_lane=3,
    lane_length=20.0,
    speed_limit=60.0,
    cell_length=5.0,
    vehicle_length=5.0,
    simulation_frequency=30,
    policy_length=10,  # seconds one action vector persists
    signal_length=2,  # seconds per signal phase
    action_min=0.1,
    action_max=0.9,
    duration=1,  # actions per episode
    static_speed=0.2,  # queue threshold (m/s)
    num_schedule_obs=10,
    # SOFT-mode signal-gate sharpness multiplier (1.0 = reference parity).
    # >1 narrows the soft/hard surrogate gap the 5x5 training exploits
    # (round-4: soft loss kept falling while hard eval regressed); hard
    # mode is untouched.
    soft_gate_scale=1.0,
    # "soft" (reference parity) | "st": straight-through gates — the SOFT
    # episode's forward values become the HARD thresholds (training loss
    # = hard eval metric) while gradients flow through the sigmoids
    gate_mode="soft",
    max_num_micro_vehicle_per_lane=10,
    mode="macro",  # macro | micro | hybrid
    random_seed=0,
)


class EpisodeData(NamedTuple):
    """Per-episode device arrays (drawn at reset, constant during rollout)."""

    schedule: jax.Array  # f32[T, L] inflow density
    mroute_next: jax.Array  # i32[T, L] per-step MacroRoute
    mroute_prev: jax.Array  # i32[T, L]
    inj_routes: jax.Array  # i32[L, P, R] waiting-pool routes


class LaneMeta(NamedTuple):
    """Static signal metadata per lane."""

    approaching: jax.Array  # bool[L] non-mid approaching arms
    is_we: jax.Array  # bool[L]
    inter: jax.Array  # i32[L] intersection index
    has_prev: jax.Array  # bool[L]


class EpisodeResult(NamedTuple):
    reward: jax.Array
    queue_per_step: jax.Array  # f32[T] summed squared queue * dt
    emitted: jax.Array
    absorbed: jax.Array
    injected: jax.Array
    max_wave_speed: jax.Array
    # i32[T, 3] per-step (injected, emitted, absorbed) counts; None on
    # paths that don't collect them. Event-level parity diagnostics.
    events_per_step: jax.Array | None = None


def signal_progress_table(num_signal_frame: int) -> jax.Array:
    """Phase-progress values ``(t % nsf) / nsf`` precomputed on the host in
    float64 and rounded once to float32. In-jit f32 division may be lowered
    as multiply-by-reciprocal, which can land 1 ulp off the correctly
    rounded quotient — enough to flip the HARD ``progress > action`` gate
    when an action ties a progress grid point (the reference compares the
    f64 quotient against the f32 action, i.e. the correctly rounded value;
    ``_env.py:915-960``)."""
    nsf = int(num_signal_frame)
    return jnp.asarray(np.minimum(np.arange(nsf) / nsf, 1.0), jnp.float32)


def lane_signals(meta: LaneMeta, action2d, t, num_signal_frame, n_phases,
                 differentiable: bool, gate_scale: float = 1.0,
                 st_mode: bool = False):
    """Per-lane stored signal (the reference's ``signal_info[1]``,
    ``_env.py:647``): approaching arms gate on the action-vs-progress
    comparison; mid connectors and leaving arms are always open."""
    phase = jnp.minimum(t // num_signal_frame, n_phases - 1)
    a = action2d[phase][meta.inter]  # [L]
    progress = signal_progress_table(num_signal_frame)[t % num_signal_frame]
    if differentiable:
        gate_we = soft_sigmoid(a - progress, 32.0 * gate_scale)
        gate_ns = soft_sigmoid(progress - a, 32.0 * gate_scale)
        if st_mode:
            gate_we = gate_we + jax.lax.stop_gradient(
                (a > progress).astype(jnp.float32) - gate_we)
            gate_ns = gate_ns + jax.lax.stop_gradient(
                (progress > a).astype(jnp.float32) - gate_ns)
    else:
        gate_we = (a > progress).astype(jnp.float32)
        gate_ns = (progress > a).astype(jnp.float32)
    gate = jnp.where(meta.is_we, gate_we, gate_ns)
    return jnp.where(meta.approaching, gate, 1.0)


def _make_episode_fn(spec: SceneSpec, meta: LaneMeta, config,
                     differentiable: bool, record: bool = False):
    """Build the jitted episode rollout for one scene/config."""
    gsc = float(config.get("soft_gate_scale", 1.0))
    # gate_mode "st": hard-threshold forward values, soft gradients (the
    # fused kernel's st_mode — see itscp_hybrid_episode.py)
    st_mode = str(config.get("gate_mode", "soft")) == "st"

    def stg(hard_val, soft_val):
        if not st_mode:
            return soft_val
        return soft_val + jax.lax.stop_gradient(
            hard_val.astype(jnp.float32) - soft_val)
    T = (config["policy_length"] * config["duration"] *
         config["simulation_frequency"])
    nsf = config["simulation_frequency"] * config["signal_length"]
    n_phases = max(1, (config["policy_length"] * config["duration"]) //
                   config["signal_length"])
    n_inter = config["num_intersection"] ** 2
    dt = 1.0 / config["simulation_frequency"]
    static_speed = config["static_speed"]
    veh_len = config["vehicle_length"]
    diff = differentiable
    L = spec.num_lanes
    # static: pure-macro scenes skip every micro/hybrid op in the step
    all_macro = bool(np.all(np.asarray(spec.is_macro)))

    def boundary_and_step(state, t, action2d, sched_t, rand_t, inj_routes,
                          inj_left, is_static_ms, signal_ms):
        mic = state.micro
        V = mic.position.shape[1]
        ar = jnp.arange(L)
        # action2d.shape[0] (== n_phases on the whole-episode path) so the
        # same step serves chunked rollouts whose action covers one policy
        # round only (ItscpEnv.step)
        lane_sig = lane_signals(meta, action2d, t, nsf, action2d.shape[0],
                                diff, gate_scale=gsc, st_mode=st_mode)
        incoming = jnp.where(meta.has_prev, -1.0, sched_t)

        # ---- micro injection (before leader search; _simulator.py:153-174)
        if not all_macro:
            free = jnp.where(
                mic.count > 0,
                mic.position[:, 0] - 0.5 * mic.params.length[:, 0],
                spec.length)
            inject = (~meta.has_prev & ~spec.is_macro &
                      (free > 0.5 * veh_len) & (rand_t < incoming) &
                      (inj_left > 0) & (mic.count < V))
            P = inj_routes.shape[1]
            pool_idx = jnp.clip(P - inj_left, 0, P - 1)
            new_route = inj_routes[ar, pool_idx]
            rank = jnp.cumsum(inject.astype(jnp.int32)) - 1
            new_vid = jnp.where(inject, state.veh_counter + rank, -1)
            from dhts.models.vehicle import default_params
            dflt = default_params(spec.speed_limit, (L,), veh_len)

            def tail_insert(x, newval):
                return network.tail_insert_rows(x, newval, inject)

            mic = mic._replace(
                position=tail_insert(mic.position, jnp.zeros(L)),
                speed=tail_insert(mic.speed, jnp.zeros(L)),
                params=jax.tree.map(tail_insert, mic.params, dflt),
                route=tail_insert(mic.route, new_route),
                route_idx=tail_insert(mic.route_idx,
                                      jnp.zeros(L, jnp.int32)),
                vid=tail_insert(mic.vid, new_vid),
                count=mic.count + inject.astype(jnp.int32))
            n_inj = jnp.sum(inject.astype(jnp.int32))
            state = state._replace(
                micro=mic, veh_counter=state.veh_counter + n_inj)
            inj_left = inj_left - inject.astype(jnp.int32)
        else:
            n_inj = jnp.zeros((), jnp.int32)

        # ---- macro boundary: signal-blended ghost cells -------------------
        # (reference _simulator.py:56-137)
        u_all = network.macro_cell_u(spec, state.macro)
        gl_r, gl_u = network.get_macro_boundary(spec, state, left=True,
                                                u_all=u_all)
        gl_r = jnp.where(meta.has_prev, gl_r, incoming)
        gl_u = jnp.where(meta.has_prev, gl_u,
                         arz.compute_u_eq(incoming, spec.speed_limit))
        mp = state.macro_prev
        prev_sig = jnp.where(
            ~meta.has_prev, 1.0,
            jnp.where(mp < 0, 0.0, lane_sig[jnp.clip(mp, 0, L - 1)]))
        bl_r = gl_r * prev_sig  # red upstream ghost: r=0
        bl_u = gl_u * prev_sig + spec.speed_limit * (1.0 - prev_sig)

        gr_r, gr_u = network.get_macro_boundary(spec, state, left=False,
                                                u_all=u_all)
        if diff:
            s = stg(lane_sig > 0.5, soft_sigmoid(lane_sig - 0.5,
                                                  32.0 * gsc))
        else:
            s = (lane_sig > 0.5).astype(jnp.float32)
        br_r = gr_r * s + 1.0 * (1.0 - s)  # red downstream ghost: jam wall
        br_u = gr_u * s  # red: u=0

        # ---- micro boundary: green leader vs red stop-at-end --------------
        # (reference _simulator.py:176-276)
        if all_macro:
            pd = jnp.full((L,), network.DEFAULT_HEAD_POSITION_DELTA)
            sd = jnp.zeros((L,))
            bv = network.BoundaryValues(
                left_r=bl_r, left_u=bl_u, right_r=br_r, right_u=br_u,
                head_position_delta=pd, head_speed_delta=sd)
            state, max_wave, _ = network.lanes_forward(spec, state, bv, dt,
                                                       skip_micro=True)
            emitted = jnp.zeros((), jnp.int32)
            absorbed = jnp.zeros((), jnp.int32)
            return _queue_reward(state, is_static_ms, inj_left, signal_ms,
                                 n_inj, emitted, absorbed, max_wave,
                                 lane_sig)

        pd_g, sd_g = network.find_micro_leader(spec, state)
        head = network.micro_head_info(spec, state)
        red_pd = jnp.maximum(
            spec.length - head["position"] - head["length"] * 0.5, 0.0)

        R = state.micro.route.shape[2]
        ridx = head["route_idx"]
        prev_l = jnp.where(
            ridx > 0, head["route"][ar, jnp.clip(ridx - 1, 0, R - 1)], -1)
        next_l = jnp.where(
            ridx + 1 < R, head["route"][ar, jnp.clip(ridx + 1, 0, R - 1)], -1)
        curr_l = head["route"][ar, jnp.clip(ridx, 0, R - 1)]
        prev_exist = prev_l >= 0
        next_exist = next_l >= 0
        hp = head["position"]
        if diff:
            zero_r = jnp.zeros(L)
            p_score = jnp.where(prev_exist,
                                stg(zero_r, soft_sigmoid(-hp, 16.0)), 0.0)
            c_score = stg(jnp.ones(L),
                          soft_sigmoid(hp, 16.0) *
                          soft_sigmoid(spec.length - hp, 16.0))
            n_score = jnp.where(
                next_exist,
                stg(zero_r, soft_sigmoid(hp - spec.length, 16.0)), 0.0)
        else:
            p_score = jnp.zeros(L)
            c_score = jnp.ones(L)
            n_score = jnp.zeros(L)
        ssum = p_score + c_score + n_score
        p_score, c_score, n_score = (x / ssum for x in (p_score, c_score,
                                                        n_score))
        fsig = c_score * lane_sig[jnp.clip(curr_l, 0, L - 1)]
        fsig += jnp.where(prev_exist,
                          p_score * lane_sig[jnp.clip(prev_l, 0, L - 1)], 0.0)
        fsig += jnp.where(next_exist,
                          n_score * lane_sig[jnp.clip(next_l, 0, L - 1)], 0.0)

        blend_mask = head["exists"] & ~spec.is_macro
        if diff:
            signal_ms = rms.update_mean_masked(signal_ms, fsig, blend_mask)
            const = 32.0 * gsc / jnp.maximum(
                jnp.abs(rms.mean_of(signal_ms, 1.0)), 1e-6)
            fs = stg(fsig >= 0.5, soft_sigmoid(fsig - 0.5, const))
            pd = pd_g * fs + red_pd * (1.0 - fs)
            sd = sd_g * fs  # red speed delta is 0
        else:
            green = fsig >= 0.5
            pd = jnp.where(green, pd_g, red_pd)
            sd = jnp.where(green, sd_g, 0.0)
        pd = jnp.where(blend_mask, pd, pd_g)
        sd = jnp.where(blend_mask, sd, sd_g)

        bv = network.BoundaryValues(left_r=bl_r, left_u=bl_u, right_r=br_r,
                                    right_u=br_u, head_position_delta=pd,
                                    head_speed_delta=sd)

        # ---- lane forward + conversion ------------------------------------
        state, max_wave, _ = network.lanes_forward(spec, state, bv, dt)
        from dhts.models import conversion
        state, emitted, absorbed = conversion.apply(spec, state, dt)
        return _queue_reward(state, is_static_ms, inj_left, signal_ms, n_inj,
                             emitted, absorbed, max_wave, lane_sig)

    def _queue_reward(state, is_static_ms, inj_left, signal_ms, n_inj,
                      emitted, absorbed, max_wave, lane_sig):
        # ---- queue-length reward ------------------------------------------
        # (reference _env.py:662-742: soft static-speed test, RMS-sharpened)
        u_cells = network.macro_cell_u(spec, state.macro)
        cell_m = spec.cell_mask & spec.is_macro[:, None]
        is_static_ms = rms.update_mean_masked(
            is_static_ms, static_speed - u_cells, cell_m)
        if not all_macro:
            veh_m = state.micro.active & ~spec.is_macro[:, None]
            is_static_ms = rms.update_mean_masked(
                is_static_ms, static_speed - state.micro.speed, veh_m)
        if diff:
            const = 16.0 / jnp.maximum(
                jnp.abs(rms.mean_of(is_static_ms, 1.0)), 1e-6)
            stat_c = stg(u_cells < static_speed,
                         soft_sigmoid(static_speed - u_cells, const))
        else:
            stat_c = (u_cells < static_speed).astype(jnp.float32)
        n_veh_per_cell = (state.macro.r * spec.cell_length[:, None] / veh_len)
        q_macro = jnp.sum(stat_c * n_veh_per_cell * cell_m, axis=1)
        if all_macro:
            q_lane = q_macro
        else:
            if diff:
                stat_v = stg(state.micro.speed < static_speed,
                             soft_sigmoid(static_speed - state.micro.speed,
                                          const))
            else:
                stat_v = (state.micro.speed < static_speed).astype(
                    jnp.float32)
            q_micro = jnp.sum(stat_v * veh_m, axis=1)
            q_lane = jnp.where(spec.is_macro, q_macro, q_micro)
        queue = jnp.sum(q_lane ** 2) * dt

        return (state, inj_left, is_static_ms, signal_ms, queue, n_inj,
                emitted, absorbed, jnp.max(max_wave), lane_sig)

    def _lane_flux_speed(state):
        """Per-lane (flux, avg_speed) diagnostics for the recorder path.

        The reference initializes ``flux``/``avg_speed`` histories and a
        commented-out reward term over them but never fills them
        (``_env.py:119-120,670-672,787-795``); this is the intended
        diagnostic with one uniform definition across modes:

        * ``flux``: average vehicle-mass flow along the lane, in m/s of
          vehicle length — macro ``(1/len)*sum(r*u*dx)`` (the same ``r*u``
          the flux capacitor accumulates, conversion.py:32-34), micro
          ``(1/len)*sum(v_i*len_i)`` (k*v with k the occupied fraction);
        * ``avg_speed``: mean cell speed (macro) / mean active-vehicle
          speed (micro); empty micro lanes read free-flow
          ``speed_limit`` (an empty macro lane's cells do too).
        """
        u_cells = network.macro_cell_u(spec, state.macro)
        cell_m = (spec.cell_mask & spec.is_macro[:, None]).astype(
            jnp.float32)
        flux_m = (jnp.sum(state.macro.r * u_cells * cell_m *
                          spec.cell_length[:, None], axis=1) / spec.length)
        n_c = jnp.maximum(jnp.sum(cell_m, axis=1), 1.0)
        avg_m = jnp.sum(u_cells * cell_m, axis=1) / n_c
        if all_macro:
            return flux_m, avg_m
        veh_m = (state.micro.active & ~spec.is_macro[:, None]).astype(
            jnp.float32)
        flux_v = (jnp.sum(state.micro.speed * state.micro.params.length *
                          veh_m, axis=1) / spec.length)
        n_v = jnp.sum(veh_m, axis=1)
        avg_v = jnp.where(n_v > 0,
                          jnp.sum(state.micro.speed * veh_m, axis=1) /
                          jnp.maximum(n_v, 1.0), spec.speed_limit)
        flux = jnp.where(spec.is_macro, flux_m, flux_v)
        avg = jnp.where(spec.is_macro, avg_m, avg_v)
        return flux, avg

    def episode(action_flat, data: EpisodeData, state0, key):
        """Full rollout; ``action_flat`` is the [n_phases * n_inter] action
        vector (reference action layout, ``_env.py:899-903``)."""
        action2d = action_flat.reshape(n_phases, n_inter)
        rand = jax.random.uniform(key, (T, L))
        P = data.inj_routes.shape[1]
        inj_left0 = jnp.where(~meta.has_prev & ~spec.is_macro, P, 0)

        def body(carry, inputs):
            state, inj_left, ms_stat, ms_sig = carry
            t, sched_t, nxt_t, prv_t, rand_t = inputs
            state = state._replace(macro_next=nxt_t, macro_prev=prv_t)
            (state, inj_left, ms_stat, ms_sig, queue, n_inj, emitted,
             absorbed, max_wave, lane_sig) = boundary_and_step(
                 state, t, action2d, sched_t, rand_t, data.inj_routes,
                 inj_left, ms_stat, ms_sig)
            rec = ((state.macro.r, state.micro.position, state.micro.count,
                    lane_sig) + _lane_flux_speed(state) if record else None)
            return ((state, inj_left, ms_stat, ms_sig),
                    (queue, n_inj, emitted, absorbed, max_wave, rec))

        init = (state0, inj_left0.astype(jnp.int32), rms.init_mean_state(),
                rms.init_mean_state())
        if config.get("remat", True):
            # rematerialize the step in the backward pass: O(1) residual
            # memory over the horizon at ~2.4x forward cost. With remat off,
            # XLA stores per-step residuals (fine for these state sizes) and
            # the backward is cheaper.
            body = jax.checkpoint(body)
        (_, _, _, _), (queues, n_inj, emitted, absorbed, max_wave, rec) = \
            jax.lax.scan(body, init,
                         (jnp.arange(T), data.schedule, data.mroute_next,
                          data.mroute_prev, rand),
                         unroll=config.get("unroll", 1))
        reward = -jnp.sum(queues)  # reward_queue_c = -1 (_env.py:181)
        result = EpisodeResult(reward=reward, queue_per_step=queues,
                               emitted=jnp.sum(emitted),
                               absorbed=jnp.sum(absorbed),
                               injected=jnp.sum(n_inj),
                               max_wave_speed=jnp.max(max_wave),
                               events_per_step=jnp.stack(
                                   [n_inj, emitted, absorbed], axis=1))
        return (result, rec) if record else result

    def chunk(action_flat, sched, mnext, mprev, rand, inj_routes, state0,
              inj_left, ms_stat, ms_sig):
        """One incremental rollout chunk (``ItscpEnv.step``): scan the
        ``sched.shape[0]`` provided steps from ``state0`` with an action
        covering only this chunk's phases, threading the cross-chunk carry
        (injection pools + RMS statistics) explicitly. Chaining chunks
        whose actions are consecutive slices of a full-horizon action
        reproduces ``episode`` exactly (the signal phase index is local
        to the chunk; tests/test_env_step_facade.py)."""
        action2d = action_flat.reshape(-1, n_inter)
        Tc = sched.shape[0]

        def body(carry, inputs):
            state, inj_left, ms_stat, ms_sig = carry
            t, sched_t, nxt_t, prv_t, rand_t = inputs
            state = state._replace(macro_next=nxt_t, macro_prev=prv_t)
            (state, inj_left, ms_stat, ms_sig, queue, n_inj, emitted,
             absorbed, max_wave, _) = boundary_and_step(
                 state, t, action2d, sched_t, rand_t, inj_routes,
                 inj_left, ms_stat, ms_sig)
            return ((state, inj_left, ms_stat, ms_sig),
                    (queue, n_inj, emitted, absorbed, max_wave))

        carry, (queues, n_inj, emitted, absorbed, max_wave) = jax.lax.scan(
            body, (state0, inj_left, ms_stat, ms_sig),
            (jnp.arange(Tc), sched, mnext, mprev, rand))
        result = EpisodeResult(
            reward=-jnp.sum(queues), queue_per_step=queues,
            emitted=jnp.sum(emitted), absorbed=jnp.sum(absorbed),
            injected=jnp.sum(n_inj), max_wave_speed=jnp.max(max_wave),
            events_per_step=jnp.stack([n_inj, emitted, absorbed], axis=1))
        return result, carry

    # the raw per-step function, exposed for step-level differential testing
    # against the fused whole-episode kernels
    episode.boundary_and_step = boundary_and_step
    episode.chunk = chunk
    return episode


class ItscpEnv:
    """Host-side environment wrapper: config, reset, observe, episode."""

    def __init__(self, config=None, schedule_fn=None):
        self.config = dict(DEFAULT_CONFIG)
        if config:
            self.config.update(config)
        self.schedule_fn = schedule_fn or problem_mod.random_schedule
        self.grid: grid_scene.GridScene | None = None
        self._episode_soft = None
        self._episode_hard = None

    # -- sizes ------------------------------------------------------------

    @property
    def num_timestep(self):
        c = self.config
        return (c["policy_length"] * c["duration"] *
                c["simulation_frequency"])

    def action_size(self):
        c = self.config
        # max(1, ...): same guard every episode builder applies, so a
        # policy_length shorter than signal_length still yields one phase
        # instead of a size-0 action that breaks the episode reshape
        n_phases = max(1, (c["policy_length"] * c["duration"]) //
                       c["signal_length"])
        return n_phases * c["num_intersection"] ** 2

    def observation_size(self):
        return self.config["num_schedule_obs"] * len(self.grid.keys)

    def action_bounds(self):
        c = self.config
        return c["action_min"], c["action_max"]

    # -- lifecycle ----------------------------------------------------------

    def reset(self, seed: int | None = None):
        c = self.config
        seed = c["random_seed"] if seed is None else seed
        rng = np.random.default_rng(seed if seed > 0 else None)
        rebuild = self.grid is None
        if rebuild:
            self.grid = grid_scene.build_grid(
                c["num_intersection"], c["num_lane"], c["lane_length"],
                c["speed_limit"], c["cell_length"], c["mode"],
                max_vehicles_per_lane=max(
                    16, c["max_num_micro_vehicle_per_lane"] + 6))
            self.spec, self.base_state = self.grid.builder.build(rng)
            self.meta = LaneMeta(
                approaching=jnp.asarray(self.grid.approaching),
                is_we=jnp.asarray(self.grid.is_we),
                inter=jnp.asarray(self.grid.intersection),
                has_prev=jnp.asarray(
                    np.asarray(self.spec.num_prev) > 0))
        else:
            # consume the same leading rng draws as the first-call build
            # (builder.build = build_spec + build_route_pool) so that
            # reset(seed) is idempotent — the same seed yields the same
            # scenario whether or not the grid already exists — and the
            # emission route pool is freshly drawn per episode like the
            # reference's np.random-at-event-time (conversion.py:72)
            self.base_state = self.base_state._replace(
                route_pool=self.grid.builder.build_route_pool(rng))

        T = self.num_timestep
        assert T >= self.config["num_schedule_obs"], (
            f"horizon T={T} shorter than num_schedule_obs="
            f"{self.config['num_schedule_obs']}: observation windows would "
            f"be empty (NaN observations)")
        locs = [k.loc for k in self.grid.keys]
        self.schedule = self.schedule_fn(locs, T, rng)

        # per-timestep random MacroRoute (reference _make_macro_route,
        # _env.py:194-200)
        nxts, prvs = [], []
        for _ in range(T):
            n, p = self.grid.builder.random_macro_route(rng)
            nxts.append(n)
            prvs.append(p)
        self.mroute_next = np.asarray(nxts, np.int32)
        self.mroute_prev = np.asarray(prvs, np.int32)

        # waiting pools (reference _make_micro_route, _env.py:202-219):
        # default vehicles with random routes, P per lane
        P = c["max_num_micro_vehicle_per_lane"]
        L = len(self.grid.keys)
        R = self.grid.builder.R
        inj = np.full((L, P, R), -1, np.int32)
        for l in range(L):
            for p in range(P):
                rt = self.grid.builder.random_route(l, rng)
                inj[l, p, : len(rt)] = rt

        self.data = EpisodeData(schedule=jnp.asarray(self.schedule),
                                mroute_next=jnp.asarray(self.mroute_next),
                                mroute_prev=jnp.asarray(self.mroute_prev),
                                inj_routes=jnp.asarray(inj))

        if rebuild or self._episode_soft is None:
            self._episode_soft = jax.jit(
                _make_episode_fn(self.spec, self.meta, c, True))
            self._episode_hard = jax.jit(
                _make_episode_fn(self.spec, self.meta, c, False))
            self._fused_hyb_fn = None  # scene changed: rebuild the kernel
            self._chunk_jit = None  # incremental-step chunks too
        self._inc = None  # abandon any in-flight incremental episode
        # leader-search window bound for the fused kernel: computed here,
        # once per reset, because it depends on the freshly drawn pools
        # (and reading them is a host transfer)
        from dhts.ops.pallas.itscp_hybrid_episode import leader_window
        self._fused_win_needed = max(
            leader_window(self.spec.is_macro, inj),
            leader_window(self.spec.is_macro, self.base_state.route_pool))
        return self.observe()

    def observe(self) -> np.ndarray:
        """Windowed schedule averages for open-boundary lanes, zeros
        elsewhere (reference ``observe``, ``_env.py:519-558``)."""
        k = self.config["num_schedule_obs"]
        T = self.schedule.shape[0]
        has_prev = np.asarray(self.spec.num_prev) > 0
        obs = []
        win = T // k
        for li in range(self.schedule.shape[1]):
            if has_prev[li]:
                obs.extend([0.0] * k)
            else:
                for j in range(k):
                    t0, t1 = j * win, min(j * win + win, T)
                    obs.append(float(self.schedule[t0:t1, li].mean()))
        return np.asarray(obs, np.float32)

    def episode(self, action, differentiable: bool, key) -> EpisodeResult:
        """Simulate the full horizon under ``action``; the differentiable
        variant is the training path (reference ``env.step(action, True)``).

        With ``config["use_fused_episode"]``, the differentiable path runs
        as ONE whole-episode grid-streamed Pallas kernel pair
        (:mod:`dhts.ops.pallas.itscp_hybrid_episode`) for every mode —
        on all-macro scenes the vehicle machinery is inert and it still
        beats the VMEM-resident macro kernel (62k vs 10k steps/s at 3x3;
        gradient cosine 1.0 and exact event parity vs the scan path)."""
        if self.config.get("use_fused_episode"):
            # both modes: the hard (non-differentiable) kernel is the
            # eval path — at 5x5+ the scan fallback's TPU compile is
            # minutes-to-wedge while the fused kernel compiles in seconds
            run_one = self._fused_episode_one(differentiable)
            return run_one(jnp.asarray(action), self.data, key)
        fn = self._episode_soft if differentiable else self._episode_hard
        return fn(jnp.asarray(action), self.data, self.base_state, key)

    def step(self, action, differentiable: bool = False, key=None):
        """Gym-style incremental driver (the reference ``step`` surface,
        ``_env.py:560``, which consumes the whole horizon in one call;
        here each call advances ONE policy round = ``policy_length``
        seconds so an external RL loop can act round-by-round).

        ``action``: ``[phases_per_round * n_inter]`` for this round. After
        ``duration`` calls the episode terminates. The injection stream is
        drawn once per episode from ``key`` at the first call (default:
        PRNGKey(random_seed)), and the cross-round carry (sim state,
        waiting pools, RMS statistics) is threaded exactly, so chaining
        the rounds with consecutive slices of a full-horizon action
        reproduces ``episode`` bit-for-bit. Returns
        ``(obs, reward, terminated, truncated, info)``.
        """
        c = self.config
        Tc = c["policy_length"] * c["simulation_frequency"]
        T, L = self.num_timestep, self.spec.num_lanes
        ppc = max(1, c["policy_length"] // c["signal_length"])
        n_act = ppc * c["num_intersection"] ** 2
        action = jnp.asarray(action).reshape(-1)
        assert action.shape[0] == n_act, (
            f"step() takes one policy round's action ({n_act} values), "
            f"got {action.shape[0]}")
        if getattr(self, "_inc", None) is None:
            if key is None:
                key = jax.random.PRNGKey(max(c["random_seed"], 0))
            P = self.data.inj_routes.shape[1]
            inj0 = jnp.where(~self.meta.has_prev & ~self.spec.is_macro,
                             P, 0).astype(jnp.int32)
            self._inc = dict(state=self.base_state, inj_left=inj0,
                             ms_stat=rms.init_mean_state(),
                             ms_sig=rms.init_mean_state(),
                             rand=jax.random.uniform(key, (T, L)), i=0)
        if getattr(self, "_chunk_jit", None) is None:
            self._chunk_jit = {}
        if differentiable not in self._chunk_jit:
            fn = self._episode_soft if differentiable else self._episode_hard
            self._chunk_jit[differentiable] = jax.jit(fn.chunk)
        inc = self._inc
        i, sl = inc["i"], slice(inc["i"] * Tc, (inc["i"] + 1) * Tc)
        res, (state, inj_left, ms_stat, ms_sig) = self._chunk_jit[
            differentiable](action, self.data.schedule[sl],
                            self.data.mroute_next[sl],
                            self.data.mroute_prev[sl], inc["rand"][sl],
                            self.data.inj_routes, inc["state"], inc["inj_left"],
                            inc["ms_stat"], inc["ms_sig"])
        terminated = (i + 1) * Tc >= T
        if terminated:
            self._inc = None
        else:
            self._inc = dict(state=state, inj_left=inj_left,
                             ms_stat=ms_stat, ms_sig=ms_sig,
                             rand=inc["rand"], i=i + 1)
        info = dict(result=res, round=i)
        return self.observe(), float(res.reward), terminated, False, info

    def _fused_hybrid_episode(self, action, key) -> EpisodeResult:
        run_one = self._fused_episode_one()
        return run_one(jnp.asarray(action), self.data, key)

    def _fused_episode_one(self, differentiable: bool = True):
        """Build (or reuse) the fused kernel (soft or hard mode) and
        return ``one(action_flat, data, key) -> EpisodeResult`` —
        vmappable over a scenario batch (the kernel shares the emission
        route pool across scenarios, like the scan batch path)."""
        from dhts.ops.pallas.itscp_hybrid_episode import \
            make_fused_itscp_episode

        # _fused_win is computed in reset() (where the pools change); the
        # kernel bakes it in, so a reset needing a longer walk rebuilds
        win = self._fused_win_needed
        cache = "_fused_hyb_fn" if differentiable else "_fused_hyb_fn_hard"
        if (getattr(self, cache, None) is None or
                win > getattr(self, "_fused_win", -1)):
            V = self.base_state.micro.position.shape[1]
            R = self.base_state.micro.route.shape[2]
            P = self.data.inj_routes.shape[1]
            P2 = self.base_state.route_pool.shape[1]
            setattr(self, cache, make_fused_itscp_episode(
                self.spec, self.meta, self.config, V, R, P, P2,
                differentiable=differentiable, window=win,
                wide_ops=self.config.get("use_wide_ops")))
            self._fused_win = win
        fn = getattr(self, cache)
        c = self.config
        n_phases = max(1, (c["policy_length"] * c["duration"]) //
                       c["signal_length"])
        T, L = self.num_timestep, self.spec.num_lanes
        pool = self.base_state.route_pool

        def one(action_flat, data, key, pool=pool):
            rand = jax.random.uniform(key, (T, L))  # same as the scan
            reward, queues, events = fn(
                action_flat.reshape(n_phases, -1), data.schedule,
                data.mroute_next, data.mroute_prev, rand, data.inj_routes,
                pool, with_events=True)
            ev = events[:, :3].astype(jnp.int32)
            return EpisodeResult(reward=reward, queue_per_step=queues,
                                 emitted=jnp.sum(ev[:, 1]),
                                 absorbed=jnp.sum(ev[:, 2]),
                                 injected=jnp.sum(ev[:, 0]),
                                 max_wave_speed=jnp.max(events[:, 7]),
                                 events_per_step=ev)

        return one

    # -- multi-scenario batching (no reference counterpart) -----------------

    def reset_batch(self, batch: int, seed: int | None = None):
        """Draw ``batch`` independent scenarios (schedules, per-step macro
        routes, waiting pools) and stack them into a batched EpisodeData.

        The reference trains one controller per fixed schedule; with the
        scenario axis batched, one controller trains against a distribution
        of traffic schedules in a single device program (and shards over a
        mesh data axis). Returns per-scenario observations ``[B, obs]``."""
        base_seed = (self.config["random_seed"] if seed is None else seed)
        datas, obss, wins = [], [], []
        for i in range(batch):
            obss.append(self.reset(seed=base_seed + i if base_seed > 0
                                   else None))
            datas.append(self.data)
            wins.append(self._fused_win_needed)
        self.batch_data = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
        self.batch_obs = np.stack(obss)
        # the fused kernel's leader window must cover EVERY scenario's
        # pools, not just the last reset's
        self._fused_win_needed = max(wins)
        return self.batch_obs

    def episode_batch(self, actions, differentiable: bool, keys):
        """Vmapped episodes over the scenario batch: ``actions`` [B, n_act],
        ``keys`` [B, 2] -> EpisodeResult with leading batch axis. Honors
        ``config["use_fused_episode"]`` like the single-scenario path (one
        fused kernel instance per scenario under vmap)."""
        if differentiable and self.config.get("use_fused_episode"):
            one = self._fused_episode_one()
            return jax.vmap(one)(jnp.asarray(actions), self.batch_data,
                                 keys)
        fn = self._episode_soft if differentiable else self._episode_hard
        return jax.vmap(lambda a, d, k: fn(a, d, self.base_state, k))(
            jnp.asarray(actions), self.batch_data, keys)

    def packed_episode_fn(self):
        """Pack the whole scenario batch (``reset_batch``) into ONE fused
        kernel instance: B independent episodes live side by side in the
        lane axis (block-diagonal adjacency — at 3x3 the kernel pads 144
        lanes to 256 anyway, so a second episode rides mostly in lanes the
        single-scenario kernel wastes). Returns
        ``run(actions [B, n_act], keys [B, 2]) -> EpisodeResult`` with
        per-episode rewards/queues; event counters are pack totals.

        vs ``episode_batch`` (vmap): one kernel instance instead of B —
        the per-step serialization cost is paid once for the pack rather
        than once per episode. RMS statistics and queue sums are kept
        per-episode inside the kernel; cross-padding reduction orders
        differ from the single-episode kernel by design, so parity vs
        vmapped singles is tight-tolerance, not bit-exact (the
        single-episode path is unchanged and stays bit-exact vs the scan
        env)."""
        from dhts.ops.pallas.itscp_hybrid_episode import \
            make_fused_itscp_episode

        assert getattr(self, "batch_data", None) is not None, \
            "call env.reset_batch(B) first"
        B = int(self.batch_data.schedule.shape[0])
        L = self.spec.num_lanes
        c = self.config
        n_inter = c["num_intersection"] ** 2
        T = self.num_timestep

        tile = lambda a: np.concatenate([np.asarray(a)] * B, axis=0)

        def off_lanes(a):
            a = np.asarray(a)
            return np.concatenate([np.where(a >= 0, a + b * L, -1)
                                   for b in range(B)], axis=0)

        pspec = SceneSpec(
            is_macro=jnp.asarray(tile(self.spec.is_macro)),
            length=jnp.asarray(tile(self.spec.length)),
            num_cell=jnp.asarray(tile(self.spec.num_cell)),
            cell_length=jnp.asarray(tile(self.spec.cell_length)),
            cell_mask=jnp.asarray(tile(self.spec.cell_mask)),
            next_lanes=jnp.asarray(off_lanes(self.spec.next_lanes)),
            prev_lanes=jnp.asarray(off_lanes(self.spec.prev_lanes)),
            num_next=jnp.asarray(tile(self.spec.num_next)),
            num_prev=jnp.asarray(tile(self.spec.num_prev)),
            speed_limit=self.spec.speed_limit,
            vehicle_length=self.spec.vehicle_length)
        pmeta = LaneMeta(
            approaching=jnp.asarray(tile(self.meta.approaching)),
            is_we=jnp.asarray(tile(self.meta.is_we)),
            inter=jnp.asarray(np.concatenate(
                [np.asarray(self.meta.inter) + b * n_inter
                 for b in range(B)])),
            has_prev=jnp.asarray(tile(self.meta.has_prev)))
        ep_of_lane = np.repeat(np.arange(B), L)

        V = self.base_state.micro.position.shape[1]
        R = self.base_state.micro.route.shape[2]
        P = self.data.inj_routes.shape[1]
        P2 = self.base_state.route_pool.shape[1]
        kern = make_fused_itscp_episode(
            pspec, pmeta, c, V, R, P, P2, differentiable=True,
            window=self._fused_win_needed, episodes=B,
            ep_of_lane=ep_of_lane, wide_ops=c.get("use_wide_ops"))

        bd = self.batch_data
        # [B, T, L] -> [T, B*L]; route entries are lane ids -> offset
        sched_p = jnp.concatenate(list(bd.schedule), axis=1)
        moff = lambda a: jnp.concatenate(
            [jnp.where(a[b] >= 0, a[b] + b * L, -1) for b in range(B)],
            axis=1)
        mnext_p = moff(bd.mroute_next)
        mprev_p = moff(bd.mroute_prev)
        roff = lambda a, b: jnp.where(a >= 0, a + b * L, -1)
        inj_p = jnp.concatenate([roff(bd.inj_routes[b], b)
                                 for b in range(B)], axis=0)
        pool_p = jnp.concatenate([roff(self.base_state.route_pool, b)
                                  for b in range(B)], axis=0)
        n_phases = max(1, (c["policy_length"] * c["duration"]) //
                       c["signal_length"])

        def run(actions, keys):
            # [B, n_phases * n_inter] -> [n_phases, B * n_inter]
            a2 = jnp.concatenate(
                [jnp.asarray(actions)[b].reshape(n_phases, n_inter)
                 for b in range(B)], axis=1)
            rand = jnp.concatenate(
                [jax.random.uniform(keys[b], (T, L)) for b in range(B)],
                axis=1)
            reward, queues, events = kern(a2, sched_p, mnext_p, mprev_p,
                                          rand, inj_p, pool_p,
                                          with_events=True)
            ev = events[:, :3].astype(jnp.int32)
            return EpisodeResult(reward=reward, queue_per_step=queues.T,
                                 emitted=jnp.sum(ev[:, 1]),
                                 absorbed=jnp.sum(ev[:, 2]),
                                 injected=jnp.sum(ev[:, 0]),
                                 max_wave_speed=jnp.max(events[:, 7]),
                                 events_per_step=ev)

        run.kernel = kern
        return run

    def replay(self, action, key, every: int = 5):
        """Run a hard-mode episode recording state, and rasterize frames
        every ``every`` steps (the reference's eval-time frame dumps,
        ``trainer.py:113-125`` / ``_env.py:744-756``). Returns
        ``(EpisodeResult, frames)`` with frames as uint8 HxWx3 arrays."""
        from dhts.apps.control.itscp import render

        if getattr(self, "_episode_rec", None) is None:
            self._episode_rec = jax.jit(
                _make_episode_fn(self.spec, self.meta, self.config, False,
                                 record=True))
        result, rec = self._episode_rec(jnp.asarray(action), self.data,
                                        self.base_state, key)
        rs, poss, counts, sigs, flux, avg_speed = (np.asarray(x)
                                                   for x in rec)
        # per-lane [T, L] diagnostic histories (the reference's intended
        # flux/avg_speed records, _env.py:119-120; see _lane_flux_speed)
        self.flux = flux
        self.avg_speed = avg_speed
        active = np.arange(poss.shape[2])[None, None, :] < counts[:, :, None]
        raster = render.Raster(self.grid.segments)
        frames = [
            render.render_frame(self.grid, self.spec, rs[t], poss[t],
                                active[t], sigs[t], raster)
            for t in range(0, rs.shape[0], max(1, every))
        ]
        return result, frames
