"""Multi-chip sharding of batched training / simulation over a device mesh.

Two real shardings are provided, matching how this workload actually scales:

* **data parallelism** over the scenario batch: each device rolls a slice of
  the batch of episodes, the controller parameters are replicated, and the
  gradient mean reduces with one ``psum`` over the ``data`` axis (inserted
  by XLA from the sharding annotations).
* **spatial (lane-axis) parallelism** inside one scenario: the per-lane state
  arrays (cells ``[L, C]``, vehicles ``[L, V]``) are sharded over a ``lane``
  axis. The network step's boundary gathers (neighbor edge cells, route-walk
  leader search) read across shard boundaries; under ``jit`` with sharding
  constraints XLA lowers those gathers to the necessary collectives — the
  per-lane physics stays fully local.

Both compose on a 2-D ``(data, lane)`` mesh. Use
``dhts.parallel.mesh.make_mesh`` and the builders below; see
``__graft_entry__.dryrun_multichip`` for an end-to-end multi-device training
step exercised on a virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: dict[str, int]) -> Mesh:
    """Create a Mesh from ``{"data": d, "lane": l, ...}`` (row-major)."""
    names = tuple(mesh_shape.keys())
    dims = tuple(mesh_shape.values())
    n = int(np.prod(dims))
    devs = np.asarray(jax.devices()[:n]).reshape(dims)
    return Mesh(devs, names)


def shard_episode_batch(mesh: Mesh, keys):
    """Place a batch of PRNG keys on the data axis."""
    return jax.device_put(keys, NamedSharding(mesh, P("data")))


def _make_dp_train_step(env, model, optimizer, mesh: Mesh, obs, low, high,
                        use_shard_map: bool):
    """Shared body of the two DP train-step builders below."""
    from dhts.apps.control.controller import squash_action

    def episode_loss(params, key):
        raw = model.apply(params, obs)
        action = squash_action(raw, low, high)
        return -env.episode(action, True, key).reward

    def batch_mean_loss(params, keys):
        return jnp.mean(jax.vmap(lambda k: episode_loss(params, k))(keys))

    if use_shard_map:
        def local_mean_loss(params, keys_local):
            return jax.lax.pmean(batch_mean_loss(params, keys_local),
                                 axis_name="data")

        # check_vma=False: pallas_call out_shapes carry no varying-mesh-
        # axes metadata, which the shard_map vma checker (jax>=0.9) rejects
        loss_fn = jax.shard_map(local_mean_loss, mesh=mesh,
                                in_specs=(P(), P("data")), out_specs=P(),
                                check_vma=False)
    else:
        loss_fn = batch_mean_loss

    def train_step(params, opt_state, keys):
        loss, grads = jax.value_and_grad(loss_fn)(params, keys)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(train_step,
                   in_shardings=(repl, repl, data),
                   out_shardings=(repl, repl, repl))


def make_dp_train_step(env, model, optimizer, mesh: Mesh, obs, low, high):
    """Data-parallel ITSCP training step over a batch of episodes.

    ``fn(params, opt_state, keys[B]) -> (params, opt_state, loss)`` with
    ``keys`` sharded over the ``data`` mesh axis and parameters replicated.
    The per-episode losses are vmapped; the mean's gradient reduction is the
    one cross-device collective (inserted by the compiler).
    """
    return _make_dp_train_step(env, model, optimizer, mesh, obs, low, high,
                               use_shard_map=False)


def make_dp_train_step_shardmap(env, model, optimizer, mesh: Mesh, obs,
                                low, high):
    """Data-parallel training step with the episode batch executed inside
    ``shard_map`` instead of relying on the compiler to partition it.

    Functionally identical to :func:`make_dp_train_step`, but REQUIRED when
    the episode runs as a fused Pallas kernel (``use_fused_episode``):
    XLA's SPMD partitioner cannot split a Pallas custom call over the
    vmapped scenario axis, whereas under shard_map each device simply runs
    its own vmapped kernel instance over its local key shard. The only
    cross-device collective is the ``pmean`` of the local losses (and,
    through its transpose, the gradient all-reduce) riding ICI.
    """
    return _make_dp_train_step(env, model, optimizer, mesh, obs, low, high,
                               use_shard_map=True)


def lane_sharded_rollout(spec, mesh: Mesh, delta_time, num_steps,
                         differentiable=False, boundary_fn=None):
    """One-scenario rollout with the lane axis of all state arrays sharded
    over the ``lane`` mesh axis. Returns ``fn(state) -> (state, max_wave)``.

    Leading-axis-L arrays get ``P("lane", ...)``; XLA partitions the
    elementwise physics and inserts collectives for the cross-lane boundary
    gathers. ``spec.num_lanes`` must be divisible by the lane-axis size.
    """
    from dhts.models import network

    L = spec.num_lanes
    n_lane = mesh.shape["lane"]
    assert L % n_lane == 0, f"{L} lanes not divisible by lane axis {n_lane}"

    from dhts.parallel.spatial import lane_pspec

    def shard_spec_of(x):
        return NamedSharding(mesh, lane_pspec(x, L, "lane"))

    def constrain(state):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, shard_spec_of(x)),
            state)

    def rollout(state):
        state = constrain(state)

        def body(s, _):
            s, d = network.network_step(spec, s, delta_time, differentiable,
                                        boundary_fn=boundary_fn)
            return constrain(s), d.max_wave_speed

        return jax.lax.scan(body, state, None, length=num_steps)

    return jax.jit(rollout)
