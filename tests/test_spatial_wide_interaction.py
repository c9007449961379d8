"""Multi-shard vs single-device banded/wide kernel interaction (round 4).

The sharded-fused episode (:mod:`dhts.ops.pallas.itscp_spatial_step`) and
the single-device banded/wide whole-episode kernel
(:mod:`dhts.ops.pallas.itscp_hybrid_episode`) evolved independently in
round 3; the 8-device dryrun pinned only a 2x2 config. This test runs the
5x5 hybrid scene (400 lanes -> Lp=512, the banded regime) sharded 2- and
4-way on the CPU mesh and compares reward / per-step queues / event counts
/ action gradient against BOTH the scan env and the single-device fused
kernel with ``wide_ops=True`` (banded + wide + leader latch + hop peel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode
from dhts.ops.pallas.itscp_spatial_step import make_fused_spatial_episode

pytestmark = pytest.mark.slow

CFG = dict(num_intersection=5, num_lane=1, lane_length=5.0,
           speed_limit=20.0, cell_length=5.0, policy_length=18,
           signal_length=2, simulation_frequency=10, random_seed=3,
           max_num_micro_vehicle_per_lane=4, mode="hybrid")


@pytest.fixture(scope="module")
def env5():
    env = ItscpEnv(config=CFG, schedule_fn=problem_1)
    env.reset()
    return env


@pytest.fixture(scope="module")
def wide_single(env5):
    """Single-device fused episode, banded + wide, and its reward/grad."""
    env = env5
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    fused = make_fused_itscp_episode(
        env.spec, env.meta, env.config, V, R, P, P2, differentiable=True,
        window=env._fused_win_needed, interpret=True, wide_ops=True)
    assert fused.banded, "5x5 must take the banded path"
    key = jax.random.PRNGKey(0)
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(key, (T, L))
    n_phases = fused.geometry["n_phases"]
    action = jnp.full(env.action_size(), 0.55)

    def frun(a):
        return fused(a.reshape(n_phases, -1), env.data.schedule,
                     env.data.mroute_next, env.data.mroute_prev, rand,
                     env.data.inj_routes, env.base_state.route_pool)[0]

    reward = float(frun(action))
    grad = np.asarray(jax.grad(frun)(action))
    return action, key, reward, grad


@pytest.mark.parametrize("n_shard", [2, 4])
def test_sharded_5x5_matches_wide_single_device(env5, wide_single, n_shard):
    env = env5
    action, key, reward_w, grad_w = wide_single
    mesh = Mesh(np.array(jax.devices()[:n_shard]), ("lane",))
    ep = make_fused_spatial_episode(env, mesh, differentiable=True)
    res = ep(action, key)

    # the scan env is the parity root; both kernels must sit near it
    ref = env.episode(action, True, key)
    assert int(ref.emitted) > 0  # live conversion events in the scene
    np.testing.assert_allclose(float(res.reward), float(ref.reward),
                               rtol=1e-4, atol=1e-5)
    assert int(res.injected) == int(ref.injected)
    assert int(res.emitted) == int(ref.emitted)
    assert int(res.absorbed) == int(ref.absorbed)

    # sharded vs single-device wide kernel: same scene, same episode data
    assert float(res.reward) == pytest.approx(reward_w, rel=2e-3, abs=2e-3)

    g_s = np.asarray(jax.grad(lambda a: ep(a, key).reward)(action))
    cos = np.sum(g_s * grad_w) / (
        np.linalg.norm(g_s) * np.linalg.norm(grad_w) + 1e-30)
    assert cos > 0.9999, cos
    assert np.isfinite(g_s).all()
