"""Geometric lane stand-ins matching the highway-env API surface the
reference uses: ``AbstractLane.DEFAULT_WIDTH`` (= 4), ``LineType`` enum
names, and ``StraightLane`` with ``length`` / ``position(longitudinal,
lateral)`` — the straight-line parameterization highway-env documents."""

import numpy as np


class AbstractLane:
    DEFAULT_WIDTH: float = 4.0


class LineType:
    NONE = 0
    STRIPED = 1
    CONTINUOUS = 2
    CONTINUOUS_LINE = 3


class StraightLane(AbstractLane):
    def __init__(self, start, end, width=AbstractLane.DEFAULT_WIDTH,
                 line_types=None, forbidden=False, speed_limit=20,
                 priority=0):
        self.start = np.asarray(start, dtype=float)
        self.end = np.asarray(end, dtype=float)
        self.width = width
        self.line_types = line_types
        self.speed_limit = speed_limit
        delta = self.end - self.start
        self.length = float(np.linalg.norm(delta))
        self.heading = float(np.arctan2(delta[1], delta[0]))
        self.direction = delta / self.length
        self.direction_lateral = np.array([-self.direction[1],
                                           self.direction[0]])

    def position(self, longitudinal, lateral):
        return (self.start + longitudinal * self.direction +
                lateral * self.direction_lateral)

    def heading_at(self, longitudinal):
        return self.heading
