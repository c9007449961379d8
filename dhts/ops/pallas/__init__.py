"""Pallas TPU kernels for the simulation hot paths.

XLA already fuses the elementwise physics well *within* a step; what it does
not do is fuse *across* the time axis — a ``lax.scan`` rollout executes one
small launch per step, and for this workload (tens of cells x a scenario
batch) per-step overhead dominates. The kernels here run the whole rollout
inside a single Pallas program with the state resident in VMEM.
"""

from dhts.ops.pallas.itscp_episode import make_fused_itscp_macro_episode
from dhts.ops.pallas.itscp_hybrid_episode import make_fused_itscp_episode
from dhts.ops.pallas.itscp_spatial_step import (
    make_fused_spatial_episode, make_fused_spatial_train_step,
    make_fused_spatial_train_step_2d)
from dhts.ops.pallas.macro_rollout import (make_fused_macro_rollout,
                                            make_segmented_macro_rollout)
from dhts.ops.pallas.micro_rollout import make_fused_micro_rollout

__all__ = ["make_fused_itscp_macro_episode", "make_fused_itscp_episode",
           "make_fused_macro_rollout", "make_fused_micro_rollout",
           "make_fused_spatial_episode", "make_fused_spatial_train_step",
           "make_fused_spatial_train_step_2d",
           "make_segmented_macro_rollout"]
