"""Backprop-through-simulation trainer for the ITSCP controller.

Parity target: reference ``example/control/trainer.py:13-227``: per epoch,
run ``num_episode_per_epoch`` differentiable episodes, minimize the negative
mean episode reward with Adam, evaluate every ``num_eval_epoch`` epochs in
hard (non-differentiable) mode, append ``eval.txt``, and checkpoint the
latest and best controller+optimizer state.

TPU redesign: the controller forward, the action squash, the full simulated
episode, the loss, and the Adam update are ONE jitted ``train_step`` — no
per-step Python, no env deep copies (the env is a pure function; episode
randomness comes from a split PRNG key, which is what the reference's fresh
``deepcopy`` + fresh np.random draws amount to).

Checkpoints are msgpack files written with ``flax.serialization`` (the
reference uses ``torch.save`` zips). Metrics go to ``metrics.jsonl`` always
and to TensorBoard if torch is importable (the reference logs ``loss/train``
and ``loss/eval`` scalars).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from dhts.apps.control.controller import Controller, squash_action


class Trainer:

    def __init__(self, env, network_size=(256, 256), lr=1e-3, seed=0,
                 render_eval=False, multi_scenario=False, mesh=None,
                 mesh_fused=False, packed=False, lr_schedule="const",
                 schedule_epochs=None, grad_clip=None):
        """``multi_scenario``: train the controller against the env's whole
        scenario batch (``env.reset_batch`` must have been called) — every
        scenario's episode, per-scenario observation and action, runs inside
        the one jitted train step. The reference has no counterpart (it
        trains one controller per fixed schedule).

        ``lr_schedule``: ``"const"`` (reference behavior) or ``"cosine"`` —
        linear warmup over the first ~5% of ``schedule_epochs`` updates to
        ``lr``, cosine decay to ``lr/10`` after (round-4 fix for the 5x5
        late-training regression: constant-lr Adam climbs back out of the
        basin after ~250 epochs, result/control/itscp_5x5_long).
        ``grad_clip``: optional global-norm clip applied before Adam
        (backprop through 600 chaotic simulation steps occasionally spikes).

        ``mesh``: a 2-D ``(data, lane)`` ``jax.sharding.Mesh`` — the train
        step then runs spatially sharded (the scene split over ``lane``,
        the episode batch over ``data``; see
        :func:`dhts.apps.control.itscp.spatial.make_spatial_train_step`),
        for grid scenes too large for one chip. Mutually exclusive with
        ``multi_scenario``; episodes-per-epoch must divide the data axis."""
        self.env = env
        self.render_eval = render_eval
        self.multi_scenario = multi_scenario
        self.mesh = mesh
        assert not (mesh is not None and multi_scenario)
        assert not (packed and not multi_scenario), \
            "packed=True rides the scenario batch: pass multi_scenario=True"
        if multi_scenario:
            assert getattr(env, "batch_obs", None) is not None, \
                "call env.reset_batch(B) before Trainer(multi_scenario=True)"
            self.obs = jnp.asarray(env.batch_obs)  # [B, obs]
        else:
            self.obs = jnp.asarray(env.observe())
        self.low, self.high = env.action_bounds()
        self.model = Controller(output_size=env.action_size(),
                                network_size=tuple(network_size))
        self.params = self.model.init(jax.random.PRNGKey(seed), self.obs[0]
                                      if multi_scenario else self.obs)
        if lr_schedule == "cosine":
            total = int(schedule_epochs or 100)
            warmup = max(1, total // 20)
            lr = optax.warmup_cosine_decay_schedule(
                init_value=lr / 10.0, peak_value=lr,
                warmup_steps=warmup, decay_steps=total,
                end_value=lr / 10.0)
        elif lr_schedule != "const":
            raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
        opt = optax.adam(lr)
        if grad_clip:
            opt = optax.chain(optax.clip_by_global_norm(float(grad_clip)),
                              opt)
        self.opt = opt
        self.opt_state = self.opt.init(self.params)
        self.key = jax.random.PRNGKey(seed + 1)
        # eval episodes use a FIXED key set (fold_in of this base), so the
        # eval curve compares the same held-out injection draws across
        # epochs instead of sampling a fresh episode per eval — at 5x5+
        # the per-draw reward spread buried real progress (round-3
        # artifacts) — and eval no longer consumes the training stream
        self._eval_key_base = jax.random.PRNGKey(seed + 2)
        self.best_eval_reward = -float("inf")

        if mesh is not None:
            assert "data" in mesh.axis_names and "lane" in mesh.axis_names, \
                f"mesh axes {mesh.axis_names} must be ('data', 'lane')"
            if mesh_fused:
                # per-shard Pallas step kernels between the summary
                # collectives (round 2) instead of the sharded scan step
                from dhts.ops.pallas.itscp_spatial_step import (
                    make_fused_spatial_episode,
                    make_fused_spatial_train_step_2d)

                self._train_step = make_fused_spatial_train_step_2d(
                    env, self.model, self.opt, mesh, self.obs, self.low,
                    self.high)
                ep_hard = make_fused_spatial_episode(
                    env, mesh, differentiable=False)
            else:
                from dhts.apps.control.itscp import spatial as itscp_spatial

                self._train_step = itscp_spatial.make_spatial_train_step(
                    env, self.model, self.opt, mesh, self.obs, self.low,
                    self.high)
                ep_hard = itscp_spatial.make_spatial_episode(
                    env, mesh, differentiable=False)

            # jit the controller prefix: running it eagerly costs per-op
            # dispatch (painful through the remote-TPU tunnel's ~24 ms
            # RTT); the sharded episode itself is jitted inside ep_hard
            _prefix = jax.jit(lambda params: squash_action(
                self.model.apply(params, self.obs), self.low, self.high))

            def eval_episode_sharded(params, key):
                return ep_hard(_prefix(params), key)

            self._eval_episode = eval_episode_sharded
            return

        # The per-episode data (schedules, routes, pools, base state) is
        # threaded through the jits as ARGUMENTS read from env at call
        # time, so an env.reset() after Trainer construction is honored —
        # closing over env.episode would bake them in as trace-time
        # constants (the mesh path above does the same via its builders).
        if env.config.get("use_fused_episode"):
            # built lazily at trace time so construction order vs reset()
            # doesn't matter (NB like any jit constant, the kernel's
            # leader-search window pins at first trace)
            soft_ep = lambda a, data, state0, k: env._fused_episode_one()(
                a, data, k, state0.route_pool)
        else:
            soft_ep = lambda a, data, state0, k: env._episode_soft(
                a, data, state0, k)
        if env.config.get("use_fused_episode"):
            # hard-mode eval through the fused kernel too: at 5x5+ the
            # scan fallback's TPU compile is minutes-to-wedge
            hard_ep = lambda a, data, state0, k: \
                env._fused_episode_one(False)(a, data, k)
        else:
            hard_ep = lambda a, data, state0, k: env._episode_hard(
                a, data, state0, k)

        if multi_scenario:
            B = self.obs.shape[0]

            if packed:
                # ONE fused kernel instance carrying all B scenarios side
                # by side in the lane axis (env.packed_episode_fn) instead
                # of B vmapped instances — the per-step serialization cost
                # is paid once per pack (1.4x aggregate on small scenes).
                # NB the packed kernel bakes the CURRENT batch_data; a
                # later env.reset_batch() needs a new Trainer.
                packed_run = env.packed_episode_fn()

                def loss_fn(params, keys, batch_data, state0):
                    raw = jax.vmap(lambda o: self.model.apply(params, o))(
                        self.obs)
                    actions = squash_action(raw, self.low, self.high)
                    return -jnp.mean(packed_run(actions, keys).reward)
            else:
                def loss_fn(params, keys, batch_data, state0):
                    raw = jax.vmap(lambda o: self.model.apply(params, o))(
                        self.obs)
                    actions = squash_action(raw, self.low, self.high)
                    r = jax.vmap(
                        lambda a, d, k: soft_ep(a, d, state0, k).reward
                    )(actions, batch_data, keys)
                    return -jnp.mean(r)

            def eval_episode(params, key, batch_data, state0):
                raw = jax.vmap(lambda o: self.model.apply(params, o))(
                    self.obs)
                actions = squash_action(raw, self.low, self.high)
                res = jax.vmap(lambda a, d, k: hard_ep(a, d, state0, k))(
                    actions, batch_data, jax.random.split(key, B))
                return res._replace(reward=jnp.mean(res.reward))

            data_of_env = lambda: env.batch_data
        else:
            def loss_fn(params, keys, data, state0):
                raw = self.model.apply(params, self.obs)
                action = squash_action(raw, self.low, self.high)
                rewards = jax.vmap(
                    lambda k: soft_ep(action, data, state0, k).reward)(keys)
                return -jnp.mean(rewards)

            def eval_episode(params, key, data, state0):
                raw = self.model.apply(params, self.obs)
                action = squash_action(raw, self.low, self.high)
                return hard_ep(action, data, state0, key)

            data_of_env = lambda: env.data

        def train_step(params, opt_state, keys, data, state0):
            loss, grads = jax.value_and_grad(loss_fn)(params, keys, data,
                                                      state0)
            updates, opt_state = self.opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        # jit-cached per episodes-per-epoch batch size
        _step = jax.jit(train_step)
        _eval = jax.jit(eval_episode)

        def _check_fused_window():
            # The fused kernel's leader-search window is baked in at the
            # jitted step's FIRST trace; a later env.reset() needing a
            # larger window would not retrace (same shapes) and would
            # silently truncate the leader search — fail loudly instead.
            if not env.config.get("use_fused_episode"):
                return
            built = getattr(env, "_fused_win", None)
            needed = getattr(env, "_fused_win_needed", None)
            if built is not None and needed is not None and needed > built:
                raise RuntimeError(
                    f"env.reset() grew the fused kernel's leader-search "
                    f"window (needs {needed}, kernel built with {built}); "
                    f"the jitted train step pinned the old kernel — "
                    f"rebuild the Trainer after such a reset")

        def _train(p, o, k):
            _check_fused_window()
            return _step(p, o, k, data_of_env(), env.base_state)

        self._train_step = _train
        self._eval_episode = lambda p, k: _eval(p, k, data_of_env(),
                                                env.base_state)

    # -- training loop ------------------------------------------------------

    def train(self, num_episode_per_epoch: int, num_epoch: int,
              num_eval_epoch: int, num_eval_episode: int, log_path: str,
              verbose: bool = True, initial_best: float = -float("inf"),
              epoch_offset: int = 0):
        """``initial_best``/``epoch_offset`` support staged runs (e.g. gate
        -scale annealing) that call train() repeatedly on fresh Trainers
        sharing one ``log_path``: the best-checkpoint bar carries across
        stages and metric/TB epochs stay monotone."""
        os.makedirs(log_path, exist_ok=True)
        metrics_path = os.path.join(log_path, "metrics.jsonl")
        tb = _maybe_tensorboard(log_path)
        self.best_eval_reward = initial_best
        history = []

        for _epoch in range(num_epoch):
            epoch = _epoch + epoch_offset
            if epoch % max(1, num_eval_epoch) == 0:
                self.evaluate(epoch, num_eval_episode, log_path, tb, verbose)

            # all episodes of the epoch run as one vmapped device program
            # (the reference loops deep-copied envs, trainer.py:144-166);
            # in multi-scenario mode one episode per scenario per epoch
            E = (self.obs.shape[0] if self.multi_scenario else
                 max(1, num_episode_per_epoch))
            self.key, k = jax.random.split(self.key)
            keys = jax.random.split(k, E)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                d = self.mesh.shape["data"]
                assert E % d == 0, (
                    f"num_episode_per_epoch={E} must be a multiple of the "
                    f"mesh's data axis size ({d})")
                keys = jax.device_put(
                    keys, NamedSharding(self.mesh, PartitionSpec("data")))
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, keys)
            loss = float(loss)
            history.append(loss)
            with open(metrics_path, "a") as f:
                f.write(json.dumps({"epoch": epoch, "loss_train": loss,
                                    "t": time.time()}) + "\n")
            if tb:
                tb.add_scalar("loss/train", loss, epoch)
            if verbose:
                print(f"epoch {epoch}: loss {loss:.6f}")
            self.save(os.path.join(log_path, "model.msgpack"))
        if tb:
            tb.close()
        return history

    def evaluate(self, epoch, num_episode, log_path, tb=None, verbose=True):
        total = 0.0
        for i in range(max(1, num_episode)):
            k = jax.random.fold_in(self._eval_key_base, i)
            res = self._eval_episode(self.params, k)
            total += float(res.reward)
        avg = total / max(1, num_episode)
        if self.render_eval and hasattr(self.env, "replay"):
            from dhts.apps.control.itscp.render import save_gif
            from dhts.apps.control.controller import squash_action

            # multi-scenario: render the LAST scenario (env.data holds its
            # episode data after reset_batch), with its own observation —
            # a [B, obs] batch would produce a [B, n_act] action that
            # env.replay cannot consume
            obs = self.obs[-1] if self.multi_scenario else self.obs
            raw = self.model.apply(self.params, obs)
            action = squash_action(raw, self.low, self.high)
            _, frames = self.env.replay(action, self.key)
            rdir = os.path.join(log_path, "eval_render")
            os.makedirs(rdir, exist_ok=True)
            save_gif(frames, os.path.join(rdir, f"epoch_{epoch}.gif"))
        with open(os.path.join(log_path, "eval.txt"), "a") as f:
            f.write(f"{-avg:08f}\n")
        if tb:
            tb.add_scalar("loss/eval", -avg, epoch)
        if verbose:
            print(f"  eval @ epoch {epoch}: reward {avg:.4f}")
        if avg > self.best_eval_reward:
            self.best_eval_reward = avg
            os.makedirs(os.path.join(log_path, "best"), exist_ok=True)
            self.save(os.path.join(log_path, "best", "model.msgpack"))
        return avg

    # -- checkpointing --------------------------------------------------------

    def save(self, path: str):
        blob = serialization.to_bytes({"params": self.params,
                                       "opt_state": self.opt_state})
        with open(path, "wb") as f:
            f.write(blob)

    def load(self, path: str):
        with open(path, "rb") as f:
            blob = f.read()
        target = {"params": self.params, "opt_state": self.opt_state}
        restored = serialization.from_bytes(target, blob)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]


def _maybe_tensorboard(log_path):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_path)
    except Exception:
        return None
