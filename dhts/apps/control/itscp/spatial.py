"""Spatially-sharded ITSCP episode: one huge signal-controlled grid scene
spanning a device mesh.

Data parallelism (``dhts.parallel.mesh``) scales the *batch* of episodes;
this module scales the *scene*. The lane axis of all simulation state is
sharded over a mesh axis and the full ITSCP episode — signals, stochastic
injection, signal-blended boundaries, hybrid conversion, RMS-sharpened
queue reward — runs as one ``shard_map`` scan with explicit collectives:

* the per-lane **signal** vector is action-derived, so every device
  computes the global ``lane_signals`` replicated (no communication);
* **injection** decisions are local; the injected bits ride one extra
  column on the pre-physics summary all_gather so every device can (a)
  derive remote lanes' post-injection tail/count fields analytically and
  (b) assign globally-consistent vehicle ids (the global prefix sum);
* **ghost cells / leader search / conversion** reuse the summary-row
  machinery of :mod:`dhts.parallel.spatial`;
* the **RMS statistics** and the **queue reward** are global masked sums:
  local partial sums + one ``psum`` each, keeping the running means and
  the reward bit-identical to the unsharded scan env.

Semantics match ``dhts.apps.control.itscp.env._make_episode_fn`` exactly
(states, events, vehicle ids, reward, gradients — tests/test_spatial.py);
the reference for both is ``example/control/itscp/_env.py:620-756`` +
``_simulator.py:56-276``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dhts.apps.control.itscp.env import EpisodeResult, lane_signals
from dhts.models import network
from dhts.models.vehicle import default_params
from dhts.ops import arz
from dhts.ops.dmath import soft_sigmoid
from dhts.parallel import spatial as sp
from dhts.utils import rms


def _make_parts(env, mesh: Mesh, differentiable: bool = True,
                axis_name: str = "lane"):
    """Shared builder: the shard_map-local episode body plus everything
    needed to wrap it (partition specs, per-episode constants)."""
    spec, meta, config = env.spec, env.meta, dict(env.config)
    data, state0 = env.data, env.base_state
    ctx = sp.make_context(spec, mesh, axis_name)
    L, l_loc = ctx.L, ctx.l_loc
    T = int(env.num_timestep)
    nsf = config["simulation_frequency"] * config["signal_length"]
    n_phases = max(1, (config["policy_length"] * config["duration"]) //
                   config["signal_length"])
    n_inter = config["num_intersection"] ** 2
    dt = 1.0 / config["simulation_frequency"]
    gsc = float(config.get("soft_gate_scale", 1.0))
    static_speed = config["static_speed"]
    veh_len = config["vehicle_length"]
    diff = differentiable
    u_max = ctx.u_max
    all_macro = bool(np.all(np.asarray(spec.is_macro)))
    # global replicated meta for the global signal vector
    meta_g = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), meta)

    def psum(x):
        return lax.psum(x, axis_name)

    def update_mean_psum(ms, data_vals, mask):
        """``rms.update_mean_masked`` with the sums taken over ALL lanes:
        local partials + psum (detached, like the original)."""
        d = lax.stop_gradient(jnp.asarray(data_vals, jnp.float32))
        m = mask.astype(jnp.float32)
        return rms.MeanState(total=ms.total + psum(jnp.sum(d * m)),
                             count=ms.count + psum(jnp.sum(m)))

    def step_local(spec_loc, meta_loc, carry, inputs, action2d, inj_routes):
        state, inj_left, ms_stat, ms_sig = carry
        t, sched_t, nxt_t, prv_t, rand_t = inputs
        state = state._replace(macro_next=nxt_t, macro_prev=prv_t)
        mic = state.micro
        V = mic.position.shape[1]
        arl = jnp.arange(l_loc)
        lane_sig_g = lane_signals(meta_g, action2d, t, nsf, n_phases, diff,
                                  gate_scale=gsc)
        lane_sig = ctx.local_slice(lane_sig_g)
        incoming = jnp.where(meta_loc.has_prev, -1.0, sched_t)

        # ---- injection decision (local; env.py:143-151) -------------------
        if not all_macro:
            free = jnp.where(
                mic.count > 0,
                mic.position[:, 0] - 0.5 * mic.params.length[:, 0],
                spec_loc.length)
            inject = (~meta_loc.has_prev & ~spec_loc.is_macro &
                      (free > 0.5 * veh_len) & (rand_t < incoming) &
                      (inj_left > 0) & (mic.count < V))
        else:
            inject = jnp.zeros((l_loc,), bool)

        # ---- pre-physics summary + the injection bit, one gather ----------
        sumA = jnp.concatenate(
            [sp.summary_pre(ctx, spec_loc, state),
             inject[:, None].astype(jnp.float32)], axis=1)
        gA9 = ctx.gather(sumA)
        g_inj = gA9[:, 8] > 0.5
        # derive every lane's POST-injection count/tail fields: injection
        # tail-inserts a default vehicle at position 0 with speed 0
        gA = gA9[:, :8]
        gA = gA.at[:, 4].add(g_inj.astype(jnp.float32))
        gA = gA.at[:, 5].set(jnp.where(g_inj, 0.0, gA[:, 5]))
        gA = gA.at[:, 6].set(jnp.where(g_inj, 0.0, gA[:, 6]))
        gA = gA.at[:, 7].set(jnp.where(g_inj, veh_len, gA[:, 7]))

        # ---- apply injection locally (globally-consistent vids) -----------
        if not all_macro:
            rank_l = ctx.local_slice(jnp.cumsum(g_inj.astype(jnp.int32)) - 1)
            n_inj = jnp.sum(g_inj.astype(jnp.int32))
            Pp = inj_routes.shape[1]
            pool_idx = jnp.clip(Pp - inj_left, 0, Pp - 1)
            new_route = inj_routes[arl, pool_idx]
            new_vid = jnp.where(inject, state.veh_counter + rank_l, -1)
            dflt = default_params(spec_loc.speed_limit, (l_loc,), veh_len)

            def tail_insert(x, newval):
                return network.tail_insert_rows(x, newval, inject)

            mic = mic._replace(
                position=tail_insert(mic.position, jnp.zeros(l_loc)),
                speed=tail_insert(mic.speed, jnp.zeros(l_loc)),
                params=jax.tree.map(tail_insert, mic.params, dflt),
                route=tail_insert(mic.route, new_route),
                route_idx=tail_insert(mic.route_idx,
                                      jnp.zeros(l_loc, jnp.int32)),
                vid=tail_insert(mic.vid, new_vid),
                count=mic.count + inject.astype(jnp.int32))
            state = state._replace(
                micro=mic, veh_counter=state.veh_counter + n_inj)
            inj_left = inj_left - inject.astype(jnp.int32)
        else:
            n_inj = jnp.zeros((), jnp.int32)

        # ---- macro boundary: signal-blended ghosts (env.py:182-204) -------
        gl_r, gl_u, gr_r, gr_u = sp.macro_ghosts(ctx, spec_loc, state, gA)
        gl_r = jnp.where(meta_loc.has_prev, gl_r, incoming)
        gl_u = jnp.where(meta_loc.has_prev, gl_u,
                         arz.compute_u_eq(incoming, u_max))
        mp = state.macro_prev
        prev_sig = jnp.where(
            ~meta_loc.has_prev, 1.0,
            jnp.where(mp < 0, 0.0, lane_sig_g[jnp.clip(mp, 0, L - 1)]))
        bl_r = gl_r * prev_sig
        bl_u = gl_u * prev_sig + u_max * (1.0 - prev_sig)
        if diff:
            s = soft_sigmoid(lane_sig - 0.5, 32.0 * gsc)
        else:
            s = (lane_sig > 0.5).astype(jnp.float32)
        br_r = gr_r * s + 1.0 * (1.0 - s)
        br_u = gr_u * s

        # ---- micro boundary: green leader vs red stop (env.py:206-269) ----
        if all_macro:
            pd = jnp.full((l_loc,), network.DEFAULT_HEAD_POSITION_DELTA)
            sd = jnp.zeros((l_loc,))
        else:
            pd_g, sd_g = sp.leader_search(ctx, spec_loc, state, gA)
            head = network.micro_head_info(spec_loc, state)
            red_pd = jnp.maximum(
                spec_loc.length - head["position"] - head["length"] * 0.5,
                0.0)
            R = state.micro.route.shape[2]
            ridx = head["route_idx"]
            prev_l = jnp.where(
                ridx > 0, head["route"][arl, jnp.clip(ridx - 1, 0, R - 1)],
                -1)
            next_l = jnp.where(
                ridx + 1 < R,
                head["route"][arl, jnp.clip(ridx + 1, 0, R - 1)], -1)
            curr_l = head["route"][arl, jnp.clip(ridx, 0, R - 1)]
            prev_exist = prev_l >= 0
            next_exist = next_l >= 0
            hp = head["position"]
            if diff:
                p_score = jnp.where(prev_exist, soft_sigmoid(-hp, 16.0), 0.0)
                c_score = (soft_sigmoid(hp, 16.0) *
                           soft_sigmoid(spec_loc.length - hp, 16.0))
                n_score = jnp.where(
                    next_exist, soft_sigmoid(hp - spec_loc.length, 16.0),
                    0.0)
            else:
                p_score = jnp.zeros(l_loc)
                c_score = jnp.ones(l_loc)
                n_score = jnp.zeros(l_loc)
            ssum = p_score + c_score + n_score
            p_score, c_score, n_score = (x / ssum for x in
                                         (p_score, c_score, n_score))
            fsig = c_score * lane_sig_g[jnp.clip(curr_l, 0, L - 1)]
            fsig += jnp.where(
                prev_exist, p_score * lane_sig_g[jnp.clip(prev_l, 0, L - 1)],
                0.0)
            fsig += jnp.where(
                next_exist, n_score * lane_sig_g[jnp.clip(next_l, 0, L - 1)],
                0.0)
            blend_mask = head["exists"] & ~spec_loc.is_macro
            if diff:
                ms_sig = update_mean_psum(ms_sig, fsig, blend_mask)
                const = 32.0 * gsc / jnp.maximum(
                    jnp.abs(rms.mean_of(ms_sig, 1.0)), 1e-6)
                fs = soft_sigmoid(fsig - 0.5, const)
                pd = pd_g * fs + red_pd * (1.0 - fs)
                sd = sd_g * fs
            else:
                green = fsig >= 0.5
                pd = jnp.where(green, pd_g, red_pd)
                sd = jnp.where(green, sd_g, 0.0)
            pd = jnp.where(blend_mask, pd, pd_g)
            sd = jnp.where(blend_mask, sd, sd_g)

        bv = network.BoundaryValues(left_r=bl_r, left_u=bl_u, right_r=br_r,
                                    right_u=br_u, head_position_delta=pd,
                                    head_speed_delta=sd)
        state, max_wave, _ = network.lanes_forward(spec_loc, state, bv, dt,
                                                   skip_micro=all_macro)
        if all_macro:
            emitted = absorbed = jnp.zeros((), jnp.int32)
        else:
            state, emitted, absorbed = sp.conversion_sharded(
                ctx, spec_loc, state, dt)

        # ---- queue reward (env.py:282-315; global sums via psum) ----------
        u_cells = network.macro_cell_u(spec_loc, state.macro)
        cell_m = spec_loc.cell_mask & spec_loc.is_macro[:, None]
        ms_stat = update_mean_psum(ms_stat, static_speed - u_cells, cell_m)
        if not all_macro:
            veh_m = state.micro.active & ~spec_loc.is_macro[:, None]
            ms_stat = update_mean_psum(ms_stat,
                                       static_speed - state.micro.speed,
                                       veh_m)
        if diff:
            const = 16.0 / jnp.maximum(
                jnp.abs(rms.mean_of(ms_stat, 1.0)), 1e-6)
            stat_c = soft_sigmoid(static_speed - u_cells, const)
        else:
            stat_c = (u_cells < static_speed).astype(jnp.float32)
        n_veh_per_cell = (state.macro.r * spec_loc.cell_length[:, None] /
                          veh_len)
        q_macro = jnp.sum(stat_c * n_veh_per_cell * cell_m, axis=1)
        if all_macro:
            q_lane = q_macro
        else:
            if diff:
                stat_v = soft_sigmoid(static_speed - state.micro.speed,
                                      const)
            else:
                stat_v = (state.micro.speed < static_speed).astype(
                    jnp.float32)
            q_micro = jnp.sum(stat_v * veh_m, axis=1)
            q_lane = jnp.where(spec_loc.is_macro, q_macro, q_micro)
        queue = psum(jnp.sum(q_lane ** 2)) * dt

        mw = lax.pmax(lax.stop_gradient(jnp.max(max_wave)), axis_name)
        return ((state, inj_left, ms_stat, ms_sig),
                (queue, n_inj, emitted, absorbed, mw))

    # ---------------------------------------------------------------------
    def local_episode(spec_loc, meta_loc, state0_loc, inj_left0_loc,
                      action2d, sched, nxt, prv, rand, inj_routes_loc):
        def body(carry, inputs):
            return step_local(spec_loc, meta_loc, carry, inputs, action2d,
                              inj_routes_loc)

        if config.get("remat", True):
            body = jax.checkpoint(body)
        init = (state0_loc, inj_left0_loc, rms.init_mean_state(),
                rms.init_mean_state())
        (_, _, _, _), ys = lax.scan(
            body, init, (jnp.arange(T), sched, nxt, prv, rand),
            unroll=config.get("unroll", 1))
        return ys  # (queues, n_inj, emitted, absorbed, max_wave), each [T]

    specs = sp.state_partition_specs(
        (spec, meta, state0, jnp.zeros((L,), jnp.int32), data.inj_routes),
        L, axis_name)

    P_pool = int(data.inj_routes.shape[1])
    inj_left0 = jnp.where(
        ~np.asarray(meta.has_prev) & ~np.asarray(spec.is_macro), P_pool,
        0).astype(jnp.int32)

    from types import SimpleNamespace

    return SimpleNamespace(
        ctx=ctx, local_episode=local_episode,
        specs=specs,  # (spec, meta, state0, inj_left0-row, inj_routes)
        inj_left0=inj_left0, T=T, L=L, l_loc=l_loc, n_phases=n_phases,
        n_inter=n_inter, spec=spec, meta=meta)


def make_spatial_episode(env, mesh: Mesh, differentiable: bool = True,
                        axis_name: str = "lane"):
    """Build ``fn(action_flat, key) -> EpisodeResult`` with the scene
    sharded over ``mesh``'s ``axis_name`` axis. ``env`` must be reset;
    ``env.spec.num_lanes`` must divide by the axis size."""
    p = _make_parts(env, mesh, differentiable, axis_name)
    spec_sp, meta_sp, state_sp, row_sp, inj_sp = p.specs
    t_lane = P(None, axis_name)  # [T, L] per-step inputs

    sharded = jax.shard_map(
        p.local_episode, mesh=mesh,
        in_specs=(spec_sp, meta_sp, state_sp, row_sp, P(), t_lane, t_lane,
                  t_lane, t_lane, inj_sp),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False)

    @jax.jit
    def run(action_flat, key, data, state0):
        action2d = jnp.asarray(action_flat).reshape(p.n_phases, p.n_inter)
        rand = jax.random.uniform(key, (p.T, p.L))
        queues, n_inj, emitted, absorbed, max_wave = sharded(
            p.spec, p.meta, state0, p.inj_left0, action2d, data.schedule,
            data.mroute_next, data.mroute_prev, rand, data.inj_routes)
        return EpisodeResult(
            reward=-jnp.sum(queues), queue_per_step=queues,
            emitted=jnp.sum(emitted), absorbed=jnp.sum(absorbed),
            injected=jnp.sum(n_inj), max_wave_speed=jnp.max(max_wave),
            events_per_step=jnp.stack([n_inj, emitted, absorbed], axis=1))

    def episode(action_flat, key):
        # the episode data / base state are jit ARGUMENTS read at call
        # time, so a later env.reset() (new schedule / macro routes /
        # waiting pools) is picked up exactly like env.episode — same
        # shapes, no retrace
        return run(action_flat, key, env.data, env.base_state)

    return episode


def make_spatial_train_step(env, model, optimizer, mesh: Mesh, obs, low,
                            high, axis_data: str = "data",
                            axis_lane: str = "lane"):
    """Controller training step on a 2-D ``(data, lane)`` mesh: a batch of
    episodes sharded over ``axis_data``, each episode's SCENE sharded over
    ``axis_lane`` — the full production scaling composition (scene too big
    for one chip x batch throughput), with replicated controller params
    and one psum'd loss/gradient.

    Returns ``fn(params, opt_state, keys[B]) -> (params, opt_state,
    loss)``; ``B`` must divide by the data-axis size. The per-episode loss
    matches ``-env.episode(squash(model(obs)), True, key).reward`` exactly
    (same pre-drawn randomness; tests/test_spatial.py).
    """
    import optax

    from dhts.apps.control.controller import squash_action

    assert axis_data in mesh.axis_names and axis_lane in mesh.axis_names, \
        f"mesh axes {mesh.axis_names} must include " \
        f"('{axis_data}', '{axis_lane}')"
    p = _make_parts(env, mesh, True, axis_lane)
    spec_sp, meta_sp, state_sp, row_sp, inj_sp = p.specs
    t_lane = P(None, axis_lane)

    def local_loss(spec_loc, meta_loc, state0_loc, inj0_loc, inj_routes_loc,
                   sched, nxt, prv, params, keys_local):
        def ep_loss(key):
            raw = model.apply(params, obs)
            action = squash_action(raw, low, high)
            action2d = action.reshape(p.n_phases, p.n_inter)
            # the same global draw as the unsharded episode, local columns
            rand = jax.random.uniform(key, (p.T, p.L))
            off = lax.axis_index(axis_lane) * p.l_loc
            rand_l = lax.dynamic_slice_in_dim(rand, off, p.l_loc, 1)
            queues, *_ = p.local_episode(
                spec_loc, meta_loc, state0_loc, inj0_loc, action2d, sched,
                nxt, prv, rand_l, inj_routes_loc)
            return jnp.sum(queues)  # loss = -reward

        loss_loc = jnp.mean(jax.vmap(ep_loss)(keys_local))
        # mean over the episode batch (data axis); the lane-axis pmean is
        # an identity on the forward (the psum'd episode loss is already
        # replicated across lane shards) but scales the transpose so the
        # redundantly-computed cotangents sum to exactly one gradient
        return lax.pmean(lax.pmean(loss_loc, axis_data), axis_lane)

    loss_fn = jax.shard_map(
        local_loss, mesh=mesh,
        in_specs=(spec_sp, meta_sp, state_sp, row_sp, inj_sp, t_lane,
                  t_lane, t_lane, P(), P(axis_data)),
        out_specs=P(), check_vma=False)

    def train_step_inner(params, opt_state, keys, data, state0):
        loss, grads = jax.value_and_grad(
            lambda q: loss_fn(p.spec, p.meta, state0, p.inj_left0,
                              data.inj_routes, data.schedule,
                              data.mroute_next, data.mroute_prev, q,
                              keys))(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    dspec = NamedSharding(mesh, P(axis_data))
    repl_tree = jax.tree.map(lambda _: repl, (env.data, env.base_state))
    jitted = jax.jit(train_step_inner,
                     in_shardings=(repl, repl, dspec, *repl_tree),
                     out_shardings=(repl, repl, repl))

    def train_step(params, opt_state, keys):
        # episode data / base state read at call time (see make_spatial_
        # episode): a later env.reset() is picked up without rebuilding
        return jitted(params, opt_state, keys, env.data, env.base_state)

    return train_step
