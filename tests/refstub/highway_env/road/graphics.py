"""Stub surface classes (only referenced in render paths tests never hit)."""


class WorldSurface:
    pass


class RoadGraphics:
    pass
