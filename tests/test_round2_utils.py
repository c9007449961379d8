"""Unit tests for the round-2 support utilities: roofline accounting,
the HTML episode viewer, and the generic differentiable-kernel wrapper."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dhts.utils import roofline


def test_roofline_binding_classification():
    cost = dict(flops_fwd=1e7, flops_bwd=2e7, bytes_fwd=0.0, bytes_bwd=0.0)
    # fast measured rate relative to the bounds -> compute/hbm bound
    rep = roofline.report(cost, residual_bytes_per_step=1 << 20,
                          steps_per_sec=1e6, device_kind="TPU v5 lite")
    assert rep["binding"] in ("compute", "hbm")
    # slow measured rate -> latency classified
    rep2 = roofline.report(cost, residual_bytes_per_step=1 << 20,
                           steps_per_sec=1e3, device_kind="TPU v5 lite")
    assert rep2["binding"] == "latency/serialization"
    assert 0 < rep2["mfu"] < rep["mfu"]
    # unknown device falls back to v5e peaks rather than crashing
    rep3 = roofline.report(cost, 1 << 20, 1e4, device_kind="mystery-chip")
    assert np.isfinite(rep3["mfu"])


def test_viewer_export_html(tmp_path):
    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.apps.control.itscp.viewer import export_html

    env = ItscpEnv(config=dict(
        num_intersection=1, num_lane=2, lane_length=20.0, speed_limit=20.0,
        cell_length=5.0, policy_length=2, signal_length=2,
        simulation_frequency=10, random_seed=3, mode="macro"),
        schedule_fn=problem_1)
    env.reset()
    path = export_html(env, np.full(env.action_size(), 0.5, np.float32),
                       jax.random.PRNGKey(0), str(tmp_path / "ep.html"),
                       every=4)
    html = open(path).read()
    assert os.path.getsize(path) > 10_000
    for needle in ("<canvas", "slider", "D.r", "getContext", "onwheel"):
        assert needle in html, needle


def test_dkernel_matches_body_and_grads():
    """The wrapper's pallas path (interpret on CPU) must equal the direct
    body call, and its custom VJP must equal jax.grad of the body."""
    from dhts.ops.pallas.dkernel import make_dkernel

    def body(x, y, idx):
        z = x * 2.0 + jnp.sin(y)
        s = jnp.sum(z * (idx > 0)).reshape(1, 1)
        return z, s, (idx + 1)

    ex = (jnp.ones((8, 128)), jnp.ones((8, 128)),
          jnp.zeros((8, 128), jnp.int32))
    op = make_dkernel(body, ex, diff_argnums=(0, 1), interpret=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 128)),
                    jnp.float32)
    y = x * 0.5
    idx = (x > 0).astype(jnp.int32)
    out = op(x, y, idx)
    ref = body(x, y, idx)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)

    def loss_op(x, y):
        z, s, _ = op(x, y, idx)
        return jnp.sum(z ** 2) + s[0, 0]

    def loss_ref(x, y):
        z, s, _ = body(x, y, idx)
        return jnp.sum(z ** 2) + s[0, 0]

    g1 = jax.grad(loss_op, argnums=(0, 1))(x, y)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
