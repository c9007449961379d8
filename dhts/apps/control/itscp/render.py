"""Headless rasterizer for ITSCP scenes: density-colored lanes, vehicles,
signal lights -> RGB frames / GIFs.

Replaces the reference's pygame + highway-env rendering stack
(``example/common/_comp_lane.py:61-99`` draws macro cells as density-colored
segments and micro vehicles as kinematic vehicles;
``example/control/itscp/_viewer.py`` is the pygame viewer;
``trainer.py:113-125`` dumps eval frames as PNGs) with a dependency-free
NumPy rasterizer: macro lanes are drawn per-cell with a green->red density
colormap, micro vehicles as bright squares, signals as green/red dots at the
stop line of approaching arms.
"""

from __future__ import annotations

import numpy as np


def _density_color(r):
    """0 (free) -> green, 1 (jam) -> red."""
    r = np.clip(r, 0.0, 1.0)
    return np.stack([55 + 200 * r, 55 + 200 * (1 - r), 60 * np.ones_like(r)],
                    axis=-1).astype(np.uint8)


class Raster:

    def __init__(self, segments: np.ndarray, width=720, height=720,
                 margin=30.0):
        pts = segments.reshape(-1, 2)
        lo = pts.min(0) - margin
        hi = pts.max(0) + margin
        scale = min((width - 1) / (hi[0] - lo[0]),
                    (height - 1) / (hi[1] - lo[1]))
        self.lo, self.scale = lo, scale
        self.w, self.h = width, height

    def to_px(self, xy):
        p = (np.asarray(xy) - self.lo) * self.scale
        return p

    def blank(self):
        return np.full((self.h, self.w, 3), 25, np.uint8)

    def draw_segment(self, img, a, b, color, thickness=2):
        a, b = self.to_px(a), self.to_px(b)
        n = max(2, int(np.hypot(*(b - a))) * 2)
        ts = np.linspace(0.0, 1.0, n)[:, None]
        pts = a[None] + ts * (b - a)[None]
        xs = np.clip(pts[:, 0].astype(int), 0, self.w - 1)
        ys = np.clip(pts[:, 1].astype(int), 0, self.h - 1)
        for dx in range(-(thickness // 2), thickness // 2 + 1):
            for dy in range(-(thickness // 2), thickness // 2 + 1):
                img[np.clip(ys + dy, 0, self.h - 1),
                    np.clip(xs + dx, 0, self.w - 1)] = color
        return img

    def draw_dot(self, img, p, color, radius=4):
        p = self.to_px(p)
        yy, xx = np.mgrid[-radius: radius + 1, -radius: radius + 1]
        mask = yy**2 + xx**2 <= radius**2
        ys = np.clip(int(p[1]) + yy[mask], 0, self.h - 1)
        xs = np.clip(int(p[0]) + xx[mask], 0, self.w - 1)
        img[ys, xs] = color
        return img


def render_frame(grid, spec, macro_r, micro_pos, micro_active, lane_signal
                 =None, raster: Raster | None = None) -> np.ndarray:
    """Render one frame from host-side state arrays.

    ``macro_r``: [L, C] densities, ``micro_pos``/``micro_active``: [L, V];
    ``lane_signal``: optional [L] in [0, 1] to draw stop-line lights on
    approaching arms.
    """
    raster = raster or Raster(grid.segments)
    img = raster.blank()
    num_cell = np.asarray(spec.num_cell)
    is_macro = np.asarray(spec.is_macro)
    length = np.asarray(spec.length)

    for li, seg in enumerate(grid.segments):
        a, b = seg
        if is_macro[li]:
            n = max(1, int(num_cell[li]))
            for c in range(n):
                t0, t1 = c / n, (c + 1) / n
                col = _density_color(float(macro_r[li, c]))
                raster.draw_segment(img, a + t0 * (b - a), a + t1 * (b - a),
                                    col)
        else:
            raster.draw_segment(img, a, b, np.array([80, 80, 90], np.uint8))
            for v in range(micro_pos.shape[1]):
                if micro_active[li, v]:
                    t = float(np.clip(micro_pos[li, v] / length[li], 0, 1))
                    raster.draw_dot(img, a + t * (b - a),
                                    np.array([90, 170, 255], np.uint8),
                                    radius=3)
        if lane_signal is not None and grid.approaching[li]:
            green = float(lane_signal[li]) > 0.5
            col = np.array([0, 230, 0] if green else [230, 0, 0], np.uint8)
            raster.draw_dot(img, b, col, radius=4)
    return img


def save_gif(frames, path, fps=10):
    """Write frames (list of HxWx3 uint8) as a GIF via PIL if available."""
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return False
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return True


def save_png(frame, path):
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return False
    Image.fromarray(frame).save(path)
    return True


def _demo(argv=None):
    """Render a demo episode GIF: ``python -m dhts.apps.control.itscp.render``."""
    import argparse

    import jax
    import jax.numpy as jnp

    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1

    ap = argparse.ArgumentParser("Render an ITSCP episode to GIF")
    ap.add_argument("--mode", default="hybrid",
                    choices=["macro", "micro", "hybrid"])
    ap.add_argument("--n_intersection", type=int, default=2)
    ap.add_argument("--action", type=float, default=0.5)
    ap.add_argument("--out", default="itscp_demo.gif")
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args(argv)

    env = ItscpEnv(config=dict(
        num_intersection=args.n_intersection, num_lane=1, lane_length=15.0,
        speed_limit=20.0, cell_length=5.0, policy_length=10, signal_length=2,
        simulation_frequency=10, random_seed=args.seed,
        max_num_micro_vehicle_per_lane=6, mode=args.mode),
        schedule_fn=problem_1)
    env.reset()
    action = jnp.full(env.action_size(), args.action)
    res, frames = env.replay(action, jax.random.PRNGKey(args.seed), every=2)
    ok = save_gif(frames, args.out)
    print(f"reward {float(res.reward):.3f}; wrote {args.out}" if ok else
          "PIL unavailable; no GIF written")


if __name__ == "__main__":
    _demo()
