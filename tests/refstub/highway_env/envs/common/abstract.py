"""Headless stand-in for highway_env.envs.common.abstract.AbstractEnv.

Provides exactly what the reference ``ItscpEnv`` uses from its base class:
``default_config`` (overridden and chained via ``super()``), ``self.config``,
``self.np_random``, ``update_metadata``, and a ``viewer`` slot (never used —
parity tests run with ``render_eval = False``).
"""

import numpy as np


class AbstractEnv:
    metadata = {"render_modes": ["human", "rgb_array"]}

    @classmethod
    def default_config(cls):
        return {}

    def __init__(self, config=None):
        self.config = self.default_config()
        if config:
            self.config.update(config)
        self.np_random = np.random.RandomState()
        self.viewer = None
        self.rendering_mode = "human"
        self.enable_auto_render = False

    def update_metadata(self, video_real_time_ratio=2):
        pass

    def close(self):
        pass
