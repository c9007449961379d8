"""Rendering subsystem: frames from replayed episodes, GIF/PNG output."""

import jax
import numpy as np

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.apps.control.itscp.render import Raster, render_frame, save_gif


def test_replay_renders_frames(tmp_path):
    env = ItscpEnv(config=dict(
        num_intersection=1, num_lane=1, lane_length=20.0, speed_limit=20.0,
        cell_length=5.0, policy_length=6, signal_length=2,
        simulation_frequency=10, random_seed=3,
        max_num_micro_vehicle_per_lane=4, mode="hybrid"),
        schedule_fn=problem_1)
    env.reset()
    import jax.numpy as jnp
    action = jnp.full(env.action_size(), 0.3)
    res, frames = env.replay(action, jax.random.PRNGKey(0), every=10)
    assert len(frames) == env.num_timestep // 10
    f = frames[-1]
    assert f.dtype == np.uint8 and f.shape == (720, 720, 3)
    # something was drawn (not a blank background)
    assert (f != 25).any()
    # density colormap appears on macro lanes (border)
    assert save_gif(frames, str(tmp_path / "ep.gif"))
    assert (tmp_path / "ep.gif").stat().st_size > 1000


def test_raster_draws_in_bounds():
    segs = np.asarray([[[0.0, 0.0], [100.0, 0.0]],
                       [[0.0, 10.0], [100.0, 10.0]]], np.float32)
    r = Raster(segs, width=64, height=64)
    img = r.blank()
    img = r.draw_segment(img, segs[0, 0], segs[0, 1],
                         np.array([255, 0, 0], np.uint8))
    img = r.draw_dot(img, [50.0, 10.0], np.array([0, 255, 0], np.uint8))
    assert (img[..., 0] == 255).any() and (img[..., 1] == 255).any()
