"""Fused whole-episode ITSCP-macro kernel vs the scan-based env: rewards and
action gradients must match (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.ops.pallas.itscp_episode import make_fused_itscp_macro_episode

CFG = dict(num_intersection=1, num_lane=1, lane_length=20.0,
           speed_limit=20.0, cell_length=5.0, policy_length=6,
           signal_length=2, simulation_frequency=10, random_seed=3,
           max_num_micro_vehicle_per_lane=4, mode="macro")


def _setup():
    env = ItscpEnv(config=CFG, schedule_fn=problem_1)
    env.reset()
    fused = make_fused_itscp_macro_episode(env.spec, env.meta, env.config,
                                           interpret=True)
    L, C = env.spec.num_lanes, env.spec.max_cells
    r0 = jnp.zeros((L, C))
    y0 = jnp.zeros((L, C))
    n_phases = (CFG["policy_length"] // CFG["signal_length"])
    return env, fused, r0, y0, n_phases


def test_fused_episode_reward_matches_scan():
    env, fused, r0, y0, n_phases = _setup()
    key = jax.random.PRNGKey(0)
    for a in (0.15, 0.5, 0.85):
        action = jnp.full(env.action_size(), a)
        ref = env.episode(action, True, key)
        reward, queues = fused(action.reshape(n_phases, 1),
                               env.data.schedule, env.data.mroute_next,
                               env.data.mroute_prev, r0, y0)
        assert float(reward) == pytest.approx(float(ref.reward), rel=2e-4,
                                              abs=2e-4), a
        np.testing.assert_allclose(np.asarray(queues),
                                   np.asarray(ref.queue_per_step), rtol=2e-3,
                                   atol=1e-5)


def test_fused_episode_action_gradient_matches_scan():
    env, fused, r0, y0, n_phases = _setup()
    key = jax.random.PRNGKey(0)

    def loss_scan(a):
        return -env.episode(a, True, key).reward

    def loss_fused(a):
        reward, _ = fused(a.reshape(n_phases, 1), env.data.schedule,
                          env.data.mroute_next, env.data.mroute_prev, r0, y0)
        return -reward

    a0 = jnp.full(env.action_size(), 0.4)
    gs = jax.grad(loss_scan)(a0)
    gf = jax.grad(loss_fused)(a0)
    assert np.all(np.isfinite(np.asarray(gf)))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs), rtol=1e-2,
                               atol=1e-5)


def test_trainer_with_fused_episode(tmp_path):
    """Training through the fused whole-episode kernel end-to-end."""
    from dhts.apps.control.trainer import Trainer

    env = ItscpEnv(config=dict(CFG, use_fused_episode=True),
                   schedule_fn=problem_1)
    env.reset()
    trainer = Trainer(env, network_size=(16, 16), lr=3e-3, seed=0)
    hist = trainer.train(1, 5, 5, 1, str(tmp_path / "fused"), verbose=False)
    assert np.isfinite(hist).all()
    # strict improvement: a dead-gradient regression keeps the loss flat
    assert min(hist[1:]) < hist[0] * 0.999, hist
