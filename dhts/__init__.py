"""dhts — TPU-native differentiable hybrid traffic simulation (JAX/XLA/Pallas).

A brand-new, TPU-first framework with the capabilities of the SIGGRAPH Asia 2022
"Differentiable Hybrid Traffic Simulation" reference code (SonSang/diff-hybrid-
traffic-sim): a macroscopic ARZ finite-volume lane solver with an exact Riemann
solver, a microscopic IDM car-following integrator, differentiable macro<->micro
hybrid coupling (vehicle emission/absorption via flux capacitors), a road-network
layer with routes, signals, and soft (sigmoid-relaxed) boundary/event logic, and
the downstream benchmarks (inverse initial-state estimation and intersection
signal control trained by backprop-through-simulation).

Unlike the reference (object-per-cell scalar loops on CPU with hand-written
per-step Jacobians), dhts represents lanes, cells and vehicles as fixed-shape
batched arrays, steps the whole network inside ``lax.scan`` with native
reverse-mode AD (rematerialized), implements the Riemann/IDM updates as
branch-free vectorized kernels (Pallas where it pays), and handles discrete
hybrid events as masked gather/scatter with straight-through gradient semantics.

Layout:
    dhts.ops       physics kernels: ARZ Riemann solver, Godunov update, IDM,
                   soft (sigmoid) logic, analytic-Jacobian oracles, Pallas kernels
    dhts.models    lane / vehicle / network state pytrees and step functions
    dhts.parallel  vmap scenario batching and multi-chip mesh sharding
    dhts.utils     RNG plumbing, running stats, config, logging, checkpointing
    dhts.apps      downstream applications (inverse problems, ITSCP control)
"""

__version__ = "0.1.0"
