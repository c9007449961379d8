"""Small Mosaic-lowering gap fills needed by the fused kernels.

``jax.checkpoint`` tags every residual producer with an identity
``reduce_precision(x, finfo(dtype))`` call to pin XLA's excess precision
(jax-ml/jax#22244). Pallas TPU has no lowering for ``reduce_precision_p``,
which makes in-kernel rematerialization — required by the large-scene
backward of :mod:`dhts.ops.pallas.itscp_hybrid_episode` — fail to compile.
For the dtype-matching (full-precision) form the op IS the identity, so a
lowering that passes the operand through is exact. Anything that actually
drops precision is still rejected.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax._src.lax import lax as _lax_internal
from jax._src.pallas.mosaic import lowering as _mosaic_lowering

_FULL_PRECISION = {jnp.dtype(jnp.float32): (8, 23),
                   jnp.dtype(jnp.bfloat16): (8, 7),
                   jnp.dtype(jnp.float16): (5, 10)}


def _register():
    if not any(_lax_internal.reduce_precision_p in rules
               for rules in _mosaic_lowering.lowering_rules.values()):

        @_mosaic_lowering.register_lowering_rule(
            _lax_internal.reduce_precision_p)
        def _reduce_precision_lowering_rule(ctx, x, *, exponent_bits,
                                            mantissa_bits):
            dtype = jnp.dtype(ctx.avals_in[0].dtype)
            if _FULL_PRECISION.get(dtype) == (exponent_bits, mantissa_bits):
                return x  # identity marker inserted by jax.checkpoint
            raise NotImplementedError(
                f"reduce_precision to ({exponent_bits}, {mantissa_bits}) "
                f"bits on {dtype} actually drops precision; only the "
                "identity form is supported in Pallas TPU kernels")

    from jax._src.ad_checkpoint import remat_p

    if not any(remat_p in rules
               for rules in _mosaic_lowering.lowering_rules.values()):

        @_mosaic_lowering.register_lowering_rule(remat_p)
        def _remat_lowering_rule(ctx, *args, jaxpr, **_):
            # By Mosaic-lowering time AD has already split the remat block
            # into its residual-forward / recompute placements in eqn
            # order, so the call primitive lowers by plain inlining (same
            # treatment as pjit).
            lowering_context = ctx.lowering_context.replace(
                block_shapes=ctx.block_shapes)
            return _mosaic_lowering.jaxpr_subcomp(lowering_context, jaxpr,
                                                  *args)


_register()
