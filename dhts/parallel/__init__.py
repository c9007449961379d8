"""Scenario batching and multi-chip mesh sharding.

The reference is a single-process, single-thread CPU program; dhts's
parallelism is *new design* (SURVEY §2/§5): the natural scale axis of this
workload is **scenarios** — optimization restarts, CMA-ES populations,
schedule sweeps, batched training episodes — mapped with ``vmap`` on one
chip and sharded over a ``jax.sharding.Mesh`` data axis across chips, with
XLA inserting the (tiny) gradient-psum collectives. For very large road
networks the *lane* axis of the state arrays can additionally be sharded
("spatial" parallelism), two ways:

* compiler-managed (:func:`dhts.parallel.mesh.lane_sharded_rollout`):
  sharding constraints under ``jit``; XLA inserts the collectives;
* explicit-collective (:mod:`dhts.parallel.spatial`): the step runs under
  ``shard_map`` and all cross-lane reads ride three small per-step
  ``all_gather``s of per-lane summary rows.

Both axes compose on one 2-D ``(data, lane)`` mesh — see
:func:`dhts.apps.control.itscp.spatial.make_spatial_train_step`.
"""

from dhts.parallel import batch, mesh, spatial

__all__ = ["batch", "mesh", "spatial"]
