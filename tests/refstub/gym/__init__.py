"""Stand-in for the legacy ``gym`` package: the reference only does
``from gym import spaces``; gymnasium's spaces are API-compatible."""

from gymnasium import spaces  # noqa: F401
