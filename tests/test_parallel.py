"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dhts.apps.control.controller import Controller
from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.parallel import batch as pbatch
from dhts.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def small_env(mode="hybrid"):
    env = ItscpEnv(config=dict(
        num_intersection=2, num_lane=1, lane_length=10.0, speed_limit=20.0,
        cell_length=5.0, policy_length=4, signal_length=2,
        simulation_frequency=10, random_seed=3,
        max_num_micro_vehicle_per_lane=4, mode=mode), schedule_fn=problem_1)
    env.reset()
    return env


def test_dp_train_step_runs_and_matches_single_device():
    env = small_env()
    mesh = pmesh.make_mesh({"data": 8})
    obs = jnp.asarray(env.observe())
    low, high = env.action_bounds()
    model = Controller(output_size=env.action_size(), network_size=(16, 16))
    params = model.init(jax.random.PRNGKey(0), obs)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = pmesh.make_dp_train_step(env, model, opt, mesh, obs, low, high)
    keys = pmesh.shard_episode_batch(mesh,
                                     jax.random.split(jax.random.PRNGKey(1),
                                                      8))
    p1, o1, loss_sharded = step(params, opt_state, keys)
    assert np.isfinite(float(loss_sharded))

    # single-device replica of the same computation
    from dhts.apps.control.controller import squash_action

    def loss_fn(params, keys):
        def ep(k):
            raw = model.apply(params, obs)
            a = squash_action(raw, low, high)
            return -env.episode(a, True, k).reward

        return jnp.mean(jax.vmap(ep)(keys))

    loss_local = float(loss_fn(params, jax.random.split(
        jax.random.PRNGKey(1), 8)))
    assert float(loss_sharded) == pytest.approx(loss_local, rel=1e-4,
                                                abs=1e-5)


def test_lane_sharded_rollout_matches_unsharded():
    env = small_env()
    spec = env.spec
    assert spec.num_lanes % 2 == 0
    mesh = pmesh.make_mesh({"data": 4, "lane": 2})
    state = env.base_state._replace(macro_next=env.data.mroute_next[0],
                                    macro_prev=env.data.mroute_prev[0])
    # give it something to simulate
    from dhts.models import network
    state = network.set_macro_lane_state(
        state, 0, jnp.full(int(spec.num_cell[0]), 0.5),
        jnp.full(int(spec.num_cell[0]), 10.0), spec)

    sharded = pmesh.lane_sharded_rollout(spec, mesh, 0.05, 20)
    s_final, s_wave = sharded(state)

    unsharded = pbatch.batched_network_rollout(spec, 0.05, 20, False,
                                               remat=False)
    u_final, u_wave = jax.tree.map(lambda x: x[0],
                                   unsharded(pbatch.broadcast_state(state,
                                                                    1)))
    np.testing.assert_allclose(np.asarray(s_final.macro.r),
                               np.asarray(u_final.macro.r), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_final.micro.position),
                               np.asarray(u_final.micro.position), rtol=1e-5,
                               atol=1e-5)


def test_batched_rollout_vmaps_scenarios():
    env = small_env(mode="macro")
    spec = env.spec
    state = env.base_state._replace(macro_next=env.data.mroute_next[0],
                                    macro_prev=env.data.mroute_prev[0])
    B = 4
    bs = pbatch.broadcast_state(state, B)
    # different initial densities per scenario
    r = jnp.linspace(0.1, 0.7, B)[:, None] * jnp.ones(
        (B, spec.max_cells))
    bs = bs._replace(macro=bs.macro._replace(
        r=bs.macro.r.at[:, 0, :].set(r)))
    rollout = pbatch.batched_network_rollout(spec, 0.05, 30, False)
    final, wave = jax.jit(rollout)(bs)
    r_final = np.asarray(final.macro.r[:, 0, 0])
    assert len(np.unique(np.round(r_final, 6))) > 1
    assert np.all(np.isfinite(r_final))


def test_dp_train_step_shardmap_fused_kernel():
    """shard_map DP with the episode as a fused Pallas kernel: each device
    runs its own kernel instance over its key shard; loss matches the
    unsharded scan computation."""
    env = small_env()
    env.config["use_fused_episode"] = True
    mesh = pmesh.make_mesh({"data": 4})
    obs = jnp.asarray(env.observe())
    low, high = env.action_bounds()
    model = Controller(output_size=env.action_size(), network_size=(16, 16))
    params = model.init(jax.random.PRNGKey(0), obs)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = pmesh.make_dp_train_step_shardmap(env, model, opt, mesh, obs,
                                             low, high)
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(1), 4),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("data")))
    p1, o1, loss_sharded = step(params, opt_state, keys)
    assert np.isfinite(float(loss_sharded))

    env_scan = small_env()
    from dhts.apps.control.controller import squash_action

    def loss_fn(params, keys):
        def ep(k):
            raw = model.apply(params, obs)
            a = squash_action(raw, low, high)
            return -env_scan.episode(a, True, k).reward

        return jnp.mean(jax.vmap(ep)(keys))

    keys_local = jax.random.split(jax.random.PRNGKey(1), 4)
    loss_local = float(loss_fn(params, keys_local))
    assert float(loss_sharded) == pytest.approx(loss_local, rel=1e-3,
                                                abs=1e-4)

    # gradient parity: shard_map transpose of the fused kernel's custom
    # VJP (+ pmean) vs the unsharded scan gradient — a wrong collective
    # factor would keep the loss identical but corrupt training

    def fused_loss(params, keys):
        def ep(k):
            raw = model.apply(params, obs)
            a = squash_action(raw, low, high)
            return -env.episode(a, True, k).reward

        return jnp.mean(jax.vmap(ep)(keys))

    g_scan = jax.grad(loss_fn)(params, keys_local)
    # the jitted train_step doesn't expose its gradient; rebuild the
    # shard_map loss exactly as the builder does
    import jax.sharding as jsh
    sm_loss = jax.shard_map(
        lambda p, ks: jax.lax.pmean(fused_loss(p, ks), axis_name="data"),
        mesh=mesh, in_specs=(jsh.PartitionSpec(),
                             jsh.PartitionSpec("data")),
        out_specs=jsh.PartitionSpec(), check_vma=False)
    g_sm = jax.jit(jax.grad(sm_loss))(params, keys)
    from jax.flatten_util import ravel_pytree
    flat_s, _ = ravel_pytree(g_scan)
    flat_m, _ = ravel_pytree(g_sm)
    np.testing.assert_allclose(np.asarray(flat_m), np.asarray(flat_s),
                               rtol=5e-3, atol=1e-6)
