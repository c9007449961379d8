from .road import Road


class RegulatedRoad(Road):
    pass
