"""Utils: checkpoint round-trip, validation checks, profiling timer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhts.models import network, scene
from dhts.utils import checkpoint, profiling, validate


def _tiny_scene():
    b = scene.SceneBuilder(30.0, max_vehicles_per_lane=4)
    l0 = b.add_macro_lane(50.0, 5.0)
    l1 = b.add_micro_lane(50.0)
    b.connect(l0, l1)
    return b.build(np.random.default_rng(0))


def test_checkpoint_roundtrip_network_state(tmp_path):
    spec, state = _tiny_scene()
    state = network.set_macro_lane_state(state, 0, jnp.full(10, 0.5),
                                         jnp.full(10, 10.0), spec)
    path = str(tmp_path / "sim.msgpack")
    checkpoint.save_pytree(path, state)
    restored = checkpoint.load_pytree(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validate_flags_cfl_violation():
    spec, state = _tiny_scene()
    diags = network.StepDiagnostics(
        max_wave_speed=jnp.asarray([[100.0, 0.0], [10.0, 0.0]]),
        num_collisions=jnp.asarray([0, 0]), emitted=jnp.asarray([0, 0]),
        absorbed=jnp.asarray([0, 0]))
    with pytest.raises(validate.SimulationHealthError, match="CFL"):
        validate.check_rollout(spec, diags, delta_time=0.1)
    # ok at small dt
    assert validate.check_rollout(spec, diags, delta_time=0.01) == []


def test_validate_flags_nan_gradients():
    good = {"a": jnp.ones(3)}
    bad = {"a": jnp.asarray([1.0, jnp.nan, 2.0])}
    assert validate.check_gradients(good) == []
    with pytest.raises(validate.SimulationHealthError):
        validate.check_gradients(bad)


def test_section_timer():
    t = profiling.SectionTimer()
    with t("x"):
        pass
    with t("x"):
        pass
    assert t.counts["x"] == 2
    assert "x:" in t.report()


def test_host_running_mean_window():
    from dhts.utils.rms import RunningMean

    rm = RunningMean(size=4)
    rm.update(np.asarray([1.0, 2.0]))
    rm.update(3.0)
    assert rm.mean() == pytest.approx(2.0)
    rm.update(np.asarray([10.0, 10.0, 10.0]))  # window keeps last 4
    assert rm.mean() == pytest.approx((3.0 + 30.0) / 4)
    assert rm.std() >= 1e-4
