"""Incremental gym-style ``ItscpEnv.step`` facade.

The reference env exposes highway-env's ``step(action)`` surface
(``_env.py:560``) but consumes the entire horizon in that single call;
dhts's facade advances one policy round per call so an external RL loop
can act round-by-round. Chaining ``duration`` rounds whose actions are
consecutive slices of a full-horizon action must reproduce the
whole-episode rollout EXACTLY (same injection stream, threaded RMS /
waiting-pool carry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1


def _env(mode, duration):
    cfg = dict(num_intersection=1, num_lane=2, lane_length=20.0,
               speed_limit=20.0, cell_length=5.0, simulation_frequency=10,
               policy_length=4, signal_length=2, duration=duration,
               random_seed=11, mode=mode,
               max_num_micro_vehicle_per_lane=4)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    return env


@pytest.mark.parametrize("mode", ["macro", "micro"])
def test_step_chaining_matches_episode(mode):
    duration = 3
    env = _env(mode, duration)
    key = jax.random.PRNGKey(5)
    n = env.action_size()
    action = jnp.asarray(0.2 + 0.6 * ((np.arange(n) * 3) % 7) / 6.0,
                         jnp.float32)
    full = env.episode(action, False, key)

    ppc = n // duration  # phases per policy round * n_inter
    rewards, queues = [], []
    terminated = False
    rounds = 0
    while not terminated:
        a_round = action[rounds * ppc:(rounds + 1) * ppc]
        obs, r, terminated, truncated, info = env.step(a_round, key=key)
        assert not truncated
        rewards.append(r)
        queues.append(np.asarray(info["result"].queue_per_step))
        rounds += 1
        assert rounds <= duration
    assert rounds == duration
    np.testing.assert_allclose(sum(rewards), float(full.reward),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.concatenate(queues),
                               np.asarray(full.queue_per_step),
                               rtol=1e-6, atol=1e-7)
    # a fresh episode starts after terminal: same key -> same first round
    obs2, r2, term2, _, _ = env.step(action[:ppc], key=key)
    np.testing.assert_allclose(r2, rewards[0], rtol=1e-6, atol=1e-6)


def test_step_soft_mode_carries_rms(
):
    """Soft (differentiable) chunks must thread the RMS sharpness state:
    chaining soft rounds equals the soft whole-episode rollout exactly
    (a reset of the running means between rounds would diverge)."""
    duration = 2
    env = _env("micro", duration)
    key = jax.random.PRNGKey(9)
    n = env.action_size()
    action = jnp.asarray(np.linspace(0.25, 0.75, n), jnp.float32)
    full = env.episode(action, True, key)
    ppc = n // duration
    total = 0.0
    for i in range(duration):
        _, r, term, _, _ = env.step(action[i * ppc:(i + 1) * ppc],
                                    differentiable=True, key=key)
        total += r
    assert term
    np.testing.assert_allclose(total, float(full.reward), rtol=1e-6,
                               atol=1e-6)


def test_step_action_size_guard():
    env = _env("macro", 2)
    with np.testing.assert_raises(AssertionError):
        env.step(jnp.zeros(env.action_size()))  # full-horizon action
