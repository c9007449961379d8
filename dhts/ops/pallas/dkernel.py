"""Generic differentiable single-block Pallas ops.

The spatially-sharded fused step (:mod:`dhts.ops.pallas.itscp_spatial_step`)
runs a handful of kernels per simulation step inside a ``lax.scan`` under
``shard_map``. Each kernel is a pure function ``body(*arrays) -> tuple`` of
fixed-shape arrays; this module wraps such a body as ONE ``pallas_call``
(grid-less, everything VMEM-resident) with a ``jax.custom_vjp`` whose
backward is a second pallas call computing the in-kernel ``jax.vjp`` of the
body — the same pattern the whole-episode kernel uses per grid step, but
packaged generically so step phases stay readable jnp functions (and stay
directly callable in tests, bit-identical to what the kernel computes).

Residuals are the op's INPUTS (the outer scan stacks them per step); the
backward recomputes the body once and transposes it. Integer inputs and
outputs carry no cotangent; the caller lists the differentiable input
positions explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_float(x):
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)


def make_dkernel(body, example_args, diff_argnums, *, interpret=None,
                 vmem_limit_mb: int = 100, name: str = "dkernel"):
    """Wrap ``body`` as a differentiable single-block Pallas op.

    ``example_args``: arrays fixing every input's shape/dtype (the op is
    shape-monomorphic). ``diff_argnums``: input positions that receive
    cotangents (each must be floating). Returns ``op(*args) -> outputs``
    differentiable w.r.t. the listed inputs; every FLOAT output contributes
    cotangents, integer outputs are treated as constants.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    diff_argnums = tuple(diff_argnums)
    for i in diff_argnums:
        assert _is_float(example_args[i]), f"diff arg {i} is not float"
    out_example = jax.eval_shape(body, *example_args)
    assert isinstance(out_example, tuple), "body must return a tuple"
    out_shapes = [jax.ShapeDtypeStruct(o.shape, o.dtype)
                  for o in out_example]
    f_out_idx = [i for i, o in enumerate(out_example)
                 if jnp.issubdtype(o.dtype, jnp.floating)]
    params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

    def fwd_kernel(*refs):
        ins = refs[: len(example_args)]
        outs = refs[len(example_args):]
        res = body(*(r[:] for r in ins))
        for ref, val in zip(outs, res):
            ref[:] = val

    def run_fwd(*args):
        return pl.pallas_call(
            fwd_kernel, out_shape=out_shapes, compiler_params=params,
            interpret=interpret)(*args)

    n_in = len(example_args)
    grad_shapes = [jax.ShapeDtypeStruct(example_args[i].shape,
                                        example_args[i].dtype)
                   for i in diff_argnums]

    def bwd_kernel(*refs):
        ins = refs[:n_in]
        cots = refs[n_in: n_in + len(f_out_idx)]
        outs = refs[n_in + len(f_out_idx):]
        vals = [r[:] for r in ins]

        def f(diff_vals):
            full = list(vals)
            for i, v in zip(diff_argnums, diff_vals):
                full[i] = v
            res = body(*full)
            return tuple(res[i] for i in f_out_idx)

        _, vjp = jax.vjp(f, tuple(vals[i] for i in diff_argnums))
        (grads,) = vjp(tuple(r[:] for r in cots))
        for ref, val in zip(outs, grads):
            ref[:] = val

    def run_bwd(args, cots):
        return pl.pallas_call(
            bwd_kernel, out_shape=grad_shapes, compiler_params=params,
            interpret=interpret)(*args, *cots)

    @jax.custom_vjp
    def op(*args):
        return run_fwd(*args)

    def op_fwd(*args):
        return run_fwd(*args), args

    def op_bwd(args, cots):
        import numpy as np
        from jax.dtypes import float0

        f_cots = tuple(cots[i] for i in f_out_idx)
        grads = run_bwd(args, f_cots)
        out = [None] * n_in
        for i, g in zip(diff_argnums, grads):
            out[i] = g
        # custom_vjp wants a cotangent for every input: symbolic float0
        # zeros for integer inputs, real zeros for nondiff floats
        for i in range(n_in):
            if out[i] is None:
                ex = example_args[i]
                if _is_float(ex):
                    out[i] = jnp.zeros(ex.shape, ex.dtype)
                else:
                    out[i] = np.zeros(ex.shape, float0)
        return tuple(out)

    op.defvjp(op_fwd, op_bwd)
    op.body = body  # direct (non-pallas) access for tests
    return op


def make_kernel_sg(body, example_args, *, interpret=None,
                   vmem_limit_mb: int = 100, name: str = "sgkernel"):
    """Wrap a WHOLLY-DISCRETE ``body`` as a single-block Pallas op with
    stop-gradient boundaries: float inputs and outputs are detached, so AD
    never differentiates (or re-runs) the kernel. For step phases whose
    outputs are event decisions/ids with structurally zero cotangents —
    a custom-vjp wrapper would pay a backward kernel launch to compute
    zeros."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_example = jax.eval_shape(body, *example_args)
    assert isinstance(out_example, tuple), "body must return a tuple"
    out_shapes = [jax.ShapeDtypeStruct(o.shape, o.dtype)
                  for o in out_example]
    params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

    def fwd_kernel(*refs):
        ins = refs[: len(example_args)]
        outs = refs[len(example_args):]
        res = body(*(r[:] for r in ins))
        for ref, val in zip(outs, res):
            ref[:] = val

    def op(*args):
        args = tuple(jax.lax.stop_gradient(a) if _is_float(a) else a
                     for a in args)
        out = pl.pallas_call(
            fwd_kernel, out_shape=out_shapes, compiler_params=params,
            interpret=interpret)(*args)
        return tuple(jax.lax.stop_gradient(o) if _is_float(o) else o
                     for o in out)

    op.body = body
    return op
