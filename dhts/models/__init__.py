"""State pytrees and step functions: lanes, vehicles, networks, conversion.

This is the stateful layer of dhts (layers L2-L3 of the reference's
architecture: ``road/lane``, ``road/vehicle``, ``road/network``), redesigned
as struct-of-arrays pytrees stepped by pure functions inside ``lax.scan``:

* :mod:`dhts.models.vehicle`   — per-vehicle IDM parameter sets + factories
* :mod:`dhts.models.lane`      — standalone single-lane rollouts (the
  minimum end-to-end slice; used by the inverse benchmarks)
* :mod:`dhts.models.scene`     — host-side scene builder -> static SceneSpec
* :mod:`dhts.models.network`   — NetworkState + network_step (boundary
  resolution, lane stepping, hybrid conversion) and route machinery
* :mod:`dhts.models.conversion`— masked-event macro<->micro coupling
"""

from dhts.models import conversion, lane, network, scene, vehicle

__all__ = ["conversion", "lane", "network", "scene", "vehicle"]
