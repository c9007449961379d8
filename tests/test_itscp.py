"""ITSCP environment + training tests (small instances).

Checks: grid construction invariants, signal gating actually modulates the
flow, episode rewards are finite in both soft and hard modes, gradients of
the reward w.r.t. the action are nonzero, and a few training epochs reduce
the loss on a 1-intersection scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.apps.control.itscp import scene as gscene
from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.apps.control.trainer import Trainer

SMALL = dict(num_intersection=1, num_lane=1, lane_length=20.0,
             speed_limit=20.0, cell_length=5.0, policy_length=10,
             signal_length=2, simulation_frequency=10, random_seed=3,
             max_num_micro_vehicle_per_lane=4)


def test_grid_construction_1x1():
    g = gscene.build_grid(1, 3, 20.0, 60.0, 5.0, "macro")
    # 4 corners x 2 dirs x 3 lanes = 24 arms + 3 straight + 1 right per
    # approach arm group: 4 arms x (3 straight + 1 right) = 16 connectors
    assert len(g.keys) == 24 + 16
    assert g.approaching.sum() == 12
    assert g.is_mid.sum() == 16
    # every approach arm connects into >= 1 connector, every connector into
    # exactly one leaving arm
    b = g.builder
    for i, k in enumerate(g.keys):
        if k.approaching and k.loc != "mid":
            assert len(b._next[i]) >= 1
        if k.loc == "mid":
            assert len(b._next[i]) == 1 and len(b._prev[i]) == 1


def test_grid_hybrid_3x3_border_macro():
    g = gscene.build_grid(3, 1, 5.0, 60.0, 5.0, "hybrid")
    spec = g.builder.build_spec()
    is_macro = np.asarray(spec.is_macro)
    for i, k in enumerate(g.keys):
        border = k.row in (0, 2) or k.col in (0, 2)
        assert is_macro[i] == border
    # stitching: interior intersection's north approach is fed by the
    # intersection above
    kid = g.key_to_id[gscene.LaneKey(1, 1, "north", None, True, 0)]
    assert len(g.builder._prev[kid]) == 1


def test_episode_runs_and_signal_matters():
    env = ItscpEnv(config=dict(SMALL, mode="macro"), schedule_fn=problem_1)
    env.reset()
    key = jax.random.PRNGKey(0)
    n = env.action_size()
    res_lo = env.episode(jnp.full(n, 0.1), False, key)
    res_hi = env.episode(jnp.full(n, 0.9), False, key)
    for r in (res_lo, res_hi):
        assert np.isfinite(float(r.reward))
        assert float(r.reward) <= 0.0
    # an all-WE vs all-NS split must change the outcome on an NS-heavy
    # problem-1 schedule
    assert float(res_lo.reward) != float(res_hi.reward)


@pytest.mark.parametrize("mode", ["micro", "hybrid"])
def test_episode_micro_and_hybrid(mode):
    cfg = dict(SMALL, mode=mode)
    if mode == "hybrid":
        cfg.update(num_intersection=2, lane_length=10.0)
    env = ItscpEnv(config=cfg, schedule_fn=problem_1)
    env.reset()
    key = jax.random.PRNGKey(1)
    action = jnp.full(env.action_size(), 0.5)
    hard = env.episode(action, False, key)
    soft = env.episode(action, True, key)
    assert np.isfinite(float(hard.reward))
    assert np.isfinite(float(soft.reward))
    if mode == "micro":
        assert int(hard.injected) > 0, "no vehicles ever injected"


def test_action_gradient_nonzero():
    env = ItscpEnv(config=dict(SMALL, mode="macro"), schedule_fn=problem_1)
    env.reset()
    key = jax.random.PRNGKey(2)

    def loss(a):
        return -env.episode(a, True, key).reward

    g = jax.grad(loss)(jnp.full(env.action_size(), 0.5))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_training_reduces_loss(tmp_path):
    env = ItscpEnv(config=dict(SMALL, mode="macro"), schedule_fn=problem_1)
    env.reset()
    trainer = Trainer(env, network_size=(32, 32), lr=3e-3, seed=0)
    hist = trainer.train(1, 12, 6, 1, str(tmp_path / "run"), verbose=False)
    assert np.isfinite(hist).all()
    # strict improvement: a dead-gradient regression keeps the loss flat
    assert min(hist[-4:]) < hist[0] * 0.99, (hist[0], hist[-4:])
    # checkpoints + logs exist, and reload round-trips
    assert (tmp_path / "run" / "model.msgpack").exists()
    assert (tmp_path / "run" / "eval.txt").exists()
    before = jax.tree.leaves(trainer.params)[0].copy()
    trainer.load(str(tmp_path / "run" / "model.msgpack"))
    after = jax.tree.leaves(trainer.params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


def test_multi_scenario_training(tmp_path):
    """One controller trained against a batch of random schedules in a
    single device program; per-scenario obs -> per-scenario actions."""
    env = ItscpEnv(config=dict(SMALL, mode="macro"), schedule_fn=problem_1)
    obs = env.reset_batch(3, seed=5)
    assert obs.shape[0] == 3
    # scenarios genuinely differ
    assert len(np.unique(obs.sum(axis=1))) > 1
    trainer = Trainer(env, network_size=(16, 16), lr=3e-3, seed=0,
                      multi_scenario=True)
    hist = trainer.train(1, 6, 3, 1, str(tmp_path / "multi"), verbose=False)
    assert np.isfinite(hist).all()
    res = trainer._eval_episode(trainer.params, jax.random.PRNGKey(0))
    assert np.isfinite(float(res.reward))


def test_packed_training_matches_vmap_loss(tmp_path):
    """Trainer(packed=True) trains through env.packed_episode_fn (one
    fused kernel carrying all scenarios). With identical seeds, its
    first-epoch loss must match the vmapped multi-scenario path to the
    packing parity tolerance, and training must step finitely."""
    cfg = dict(SMALL, mode="macro", use_fused_episode=True)
    losses = {}
    for packed in (False, True):
        env = ItscpEnv(config=cfg, schedule_fn=problem_1)
        env.reset_batch(2, seed=5)
        tr = Trainer(env, network_size=(16, 16), lr=3e-3, seed=0,
                     multi_scenario=True, packed=packed)
        hist = tr.train(1, 2, 2, 1, str(tmp_path / f"p{packed}"),
                        verbose=False)
        assert np.isfinite(hist).all()
        losses[packed] = hist[0]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


def test_duration_scales_horizon_like_policy_length():
    """Reference semantics: ``duration`` only scales the horizon and the
    number of action phases (its ``_simulate`` consumes the whole
    ``policy_length * duration * sim_freq`` horizon in ONE env.step,
    ``_env.py:758-768,805``), so duration=2 must be exactly equivalent to
    a doubled policy_length."""
    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1

    base = dict(num_intersection=2, num_lane=1, lane_length=10.0,
                speed_limit=20.0, cell_length=5.0, signal_length=2,
                simulation_frequency=10, random_seed=3,
                max_num_micro_vehicle_per_lane=4, mode="micro")
    env_d = ItscpEnv(config=dict(base, policy_length=4, duration=2),
                     schedule_fn=problem_1)
    env_p = ItscpEnv(config=dict(base, policy_length=8, duration=1),
                     schedule_fn=problem_1)
    env_d.reset()
    env_p.reset()
    assert env_d.num_timestep == env_p.num_timestep == 80
    assert env_d.action_size() == env_p.action_size()
    a = jnp.linspace(0.3, 0.7, env_d.action_size())
    k = jax.random.PRNGKey(5)
    rd = env_d.episode(a, True, k)
    rp = env_p.episode(a, True, k)
    assert float(rd.reward) == pytest.approx(float(rp.reward), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(rd.events_per_step),
                                  np.asarray(rp.events_per_step))


def _small_cfg(**kw):
    cfg = dict(num_intersection=2, num_lane=1, lane_length=10.0,
               speed_limit=20.0, cell_length=5.0, policy_length=4,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="micro")
    cfg.update(kw)
    return cfg


def test_reset_seed_is_idempotent():
    """reset(seed) must yield the same scenario whether or not the grid
    was already built (the first call consumes extra draws for the route
    pool; repeat calls consume the same ones)."""
    env = ItscpEnv(config=_small_cfg(), schedule_fn=problem_1)
    o1 = env.reset(seed=5)
    d1, pool1 = env.data, env.base_state.route_pool
    o2 = env.reset(seed=5)
    d2, pool2 = env.data, env.base_state.route_pool
    np.testing.assert_array_equal(o1, o2)
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(pool1), np.asarray(pool2))
    # and a different seed yields a different scenario
    env.reset(seed=6)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(env.data), jax.tree.leaves(d1)))


def test_episode_batch_honors_fused_flag():
    """episode_batch must run the fused kernel when configured, matching
    the scan batch path per scenario."""
    env_s = ItscpEnv(config=_small_cfg(), schedule_fn=problem_1)
    env_s.reset_batch(3, seed=11)
    env_f = ItscpEnv(config=_small_cfg(use_fused_episode=True),
                     schedule_fn=problem_1)
    env_f.reset_batch(3, seed=11)
    actions = jnp.stack([jnp.full(env_s.action_size(), a)
                         for a in (0.3, 0.5, 0.7)])
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    rs = env_s.episode_batch(actions, True, keys)
    rf = env_f.episode_batch(actions, True, keys)
    np.testing.assert_allclose(np.asarray(rf.reward), np.asarray(rs.reward),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(rf.events_per_step),
                                  np.asarray(rs.events_per_step))


def test_trainer_honors_env_reset():
    """The trainer's jitted paths read the episode data at call time: an
    env.reset() between epochs changes what is simulated."""
    env = ItscpEnv(config=_small_cfg(), schedule_fn=problem_1)
    env.reset(seed=5)
    tr = Trainer(env, network_size=(8, 8), lr=1e-2, seed=0)
    k = jax.random.PRNGKey(9)
    r1 = float(tr._eval_episode(tr.params, k).reward)
    env.reset(seed=31)  # new schedule / pools, same shapes
    r2 = float(tr._eval_episode(tr.params, k).reward)
    assert r1 != r2, "trainer kept simulating the stale episode data"


@pytest.mark.slow
def test_hard_mode_honors_fused_flag():
    """Round 3: with use_fused_episode, HARD-mode episodes (the eval
    path) also run the fused kernel — at 5x5+ the scan fallback's TPU
    compile is minutes-to-wedge. Reward/queues/events must match the
    scan hard path on a hybrid scene with live events."""
    cfg = dict(num_intersection=3, num_lane=1, lane_length=5.0,
               speed_limit=20.0, cell_length=5.0, policy_length=16,
               signal_length=2, simulation_frequency=10, random_seed=3,
               max_num_micro_vehicle_per_lane=4, mode="hybrid")
    key = jax.random.PRNGKey(0)
    es = ItscpEnv(config=cfg, schedule_fn=problem_1)
    es.reset()
    a = jnp.full((es.action_size(),), 0.45)
    rs = es.episode(a, False, key)
    ef = ItscpEnv(config=dict(cfg, use_fused_episode=True),
                  schedule_fn=problem_1)
    ef.reset()
    rf = ef.episode(a, False, key)
    np.testing.assert_allclose(float(rf.reward), float(rs.reward),
                               rtol=2e-3, atol=2e-3)
    assert int(rs.emitted) > 0
    for f in ("injected", "emitted", "absorbed"):
        assert int(getattr(rf, f)) == int(getattr(rs, f)), f
    np.testing.assert_allclose(np.asarray(rf.queue_per_step),
                               np.asarray(rs.queue_per_step), rtol=5e-3,
                               atol=1e-4)
