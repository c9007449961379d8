"""Stub viewer classes (imported by the reference _viewer.py, never used
when tests run the env with render_eval=False)."""


class EnvViewer:
    def __init__(self, *args, **kwargs):
        raise RuntimeError("stub EnvViewer cannot render")


class ObservationGraphics:
    pass


class EventHandler:
    pass
