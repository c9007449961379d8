"""Minimal local stand-in for the ``highway_env`` package.

The real reference (/root/reference) imports highway-env only for rendering
geometry and the gym-style ``AbstractEnv`` base class; the simulation core
(ARZ/IDM lanes, ItscpRoadNetwork) never touches it. highway-env is not
installed in this image, so tests that need to run the ACTUAL reference
``ItscpEnv`` headless (for env-level parity) put this directory on
``sys.path`` ahead of everything else. Only the exact names the reference
imports are provided.
"""
