"""Staged gate-scale annealing + CMA warm-start (round-4 training rig).

The reference trainer (``example/control/trainer.py``) has neither: these
are dhts additions for the beyond-reference-scale 5x5 problems, where the
fixed soft surrogate is exploited after ~40 epochs and problem 3's
gradient training plateaus 12 points above the CMA per-intersection floor
(``result/control/floor_cma3.json``).
"""

from __future__ import annotations

import json

import jax
import numpy as np
import pytest

from dhts.apps.control.controller import Controller, squash_action
from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import PROBLEMS
from dhts.apps.control.itscp.run import _warm_start_params, main as run_main


def _tiny_env():
    env = ItscpEnv(config=dict(
        num_intersection=1, num_lane=1, lane_length=5.0, speed_limit=60.0,
        policy_length=5, signal_length=2, mode="macro", random_seed=0),
        schedule_fn=PROBLEMS[1])
    env.reset()
    return env


def test_warm_start_head_reproduces_cma_action(tmp_path):
    env = _tiny_env()
    ws = tmp_path / "ws.json"
    ws.write_text(json.dumps({"cma_per_int_best_x": [0.55]}))
    lo, hi = env.action_bounds()
    model = Controller(output_size=env.action_size())
    p0 = model.init(jax.random.PRNGKey(0), env.observe())
    pw = _warm_start_params(p0, str(ws), env)
    a = squash_action(model.apply(pw, env.observe()), lo, hi)
    np.testing.assert_allclose(np.asarray(a), 0.55, atol=1e-4)
    # the head kernel is zeroed but its GRADIENT is not: fine-tuning moves
    loss = lambda p: squash_action(
        model.apply(p, env.observe()), lo, hi).sum()
    g = jax.grad(loss)(pw)
    head = max((k for k in g["params"] if k.startswith("Dense")),
               key=lambda k: int(k.split("_")[1]))
    assert float(np.abs(np.asarray(g["params"][head]["kernel"])).max()) > 0


def test_warm_start_rejects_shape_mismatch(tmp_path):
    env = _tiny_env()
    ws = tmp_path / "ws.json"
    ws.write_text(json.dumps({"cma_per_int_best_x": [0.5, 0.5, 0.5]}))
    model = Controller(output_size=env.action_size())
    p0 = model.init(jax.random.PRNGKey(0), env.observe())
    with pytest.raises(Exception):
        _warm_start_params(p0, str(ws), env)


def test_anneal_stages_share_log_and_carry_best(tmp_path):
    run_main(["--mode", "macro", "--problem", "1", "--n_intersection", "1",
              "--n_lane", "1", "--lane_length", "5",
              "--simulation_length", "5", "--signal_length", "2",
              "--n_trial", "1", "--anneal_gates", "1:2,4:2",
              "--lr_schedule", "cosine", "--n_eval_episode", "2",
              "--log_root", str(tmp_path)])
    trial = next((tmp_path).glob("macro_*/trial_0"))
    ev = [float(x) for x in (trial / "eval.txt").read_text().split()]
    # 2 + (2+1) epochs, eval cadence max(1, 4//10)=1 -> one eval per epoch
    assert len(ev) == 5
    stages = json.loads((trial / "stages.json").read_text())
    assert stages["anneal_gates"] == [[1.0, 2], [4.0, 2]]
    metrics = [json.loads(l)
               for l in (trial / "metrics.jsonl").read_text().splitlines()]
    assert [m["epoch"] for m in metrics] == list(range(5))  # monotone
    assert (trial / "best" / "model.msgpack").exists()
