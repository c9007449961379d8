"""Straight-through gate mode (round 4): the SOFT episode's forward
values become the HARD kernel's, so the training loss IS the hard eval
metric, while gradients flow through the soft sigmoids.

Checks, on a 3x3 hybrid scene with live events:
  * fused ST forward reward/queues/events == the hard fused kernel's
    (same inputs; exact — the ST forward computes the identical
    threshold values)
  * scan ST episode reward == the hard scan episode's
  * ST action gradient is finite and nonzero
  * default (gate_mode="soft") stays bit-identical to before the flag
    existed is covered by the existing parity suites
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode

CFG = dict(num_intersection=3, num_lane=1, lane_length=5.0,
           speed_limit=20.0, cell_length=5.0, policy_length=30,
           signal_length=2, simulation_frequency=10, random_seed=3,
           max_num_micro_vehicle_per_lane=4, mode="hybrid")


@pytest.fixture(scope="module")
def env_st():
    env = ItscpEnv(config=dict(CFG, gate_mode="st"), schedule_fn=problem_1)
    env.reset()
    return env


def _fused(env, differentiable, gate_mode):
    V = env.base_state.micro.position.shape[1]
    R = env.base_state.micro.route.shape[2]
    P = env.data.inj_routes.shape[1]
    P2 = env.base_state.route_pool.shape[1]
    return make_fused_itscp_episode(
        env.spec, env.meta, dict(env.config, gate_mode=gate_mode), V, R, P,
        P2, differentiable=differentiable, window=env._fused_win_needed,
        interpret=True)


def test_st_fused_forward_matches_hard(env_st):
    env = env_st
    R = env.base_state.micro.route.shape[2]
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(jax.random.PRNGKey(0), (T, L))
    st = _fused(env, True, "st")
    hard = _fused(env, False, "st")
    a = jnp.linspace(0.2, 0.8, env.action_size()).reshape(
        st.geometry["n_phases"], -1)
    args = (a, env.data.schedule, env.data.mroute_next,
            env.data.mroute_prev, rand, env.data.inj_routes[:, :, :R],
            env.base_state.route_pool[:, :, :R])
    rew_st, q_st = jax.jit(st)(*args)
    rew_hd, q_hd = jax.jit(hard)(*args)
    assert float(rew_st) == float(rew_hd)
    np.testing.assert_array_equal(np.asarray(q_st), np.asarray(q_hd))
    # a live scene: queues must actually form
    assert float(np.asarray(q_hd).max()) > 0


def test_st_gradient_finite_nonzero(env_st):
    env = env_st
    R = env.base_state.micro.route.shape[2]
    T, L = env.num_timestep, env.spec.num_lanes
    rand = jax.random.uniform(jax.random.PRNGKey(0), (T, L))
    st = _fused(env, True, "st")
    a = jnp.full((st.geometry["n_phases"], 9), 0.5)

    def loss(a):
        r, _ = st(a, env.data.schedule, env.data.mroute_next,
                  env.data.mroute_prev, rand,
                  env.data.inj_routes[:, :, :R],
                  env.base_state.route_pool[:, :, :R])
        return r

    g = jax.jit(jax.grad(loss))(a)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_st_scan_forward_matches_hard():
    env = ItscpEnv(config=dict(CFG, gate_mode="st"), schedule_fn=problem_1)
    env.reset()
    a = jnp.linspace(0.2, 0.8, env.action_size())
    key = jax.random.PRNGKey(1)
    r_soft_fwd = env._episode_soft(a, env.data, env.base_state, key)
    r_hard = env._episode_hard(a, env.data, env.base_state, key)
    assert float(r_soft_fwd.reward) == float(r_hard.reward)
