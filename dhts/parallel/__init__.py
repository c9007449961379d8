"""Scenario batching and multi-chip mesh sharding.

The reference is a single-process, single-thread CPU program; dhts's
parallelism is *new design* (SURVEY §2/§5): the natural scale axis of this
workload is **scenarios** — optimization restarts, CMA-ES populations,
schedule sweeps, batched training episodes — mapped with ``vmap`` on one
chip and sharded over a ``jax.sharding.Mesh`` data axis across chips, with
XLA inserting the (tiny) gradient-psum collectives. For very large road
networks the *lane* axis of the state arrays can additionally be sharded
("spatial" parallelism); boundary gathers then lower to XLA collectives
automatically under ``jit`` with sharding constraints.
"""

from dhts.parallel import batch, mesh

__all__ = ["batch", "mesh"]
