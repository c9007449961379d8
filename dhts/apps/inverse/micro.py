"""Inverse problem: microscopic platoon initial-state estimation.

Parity target: reference ``example/inverse/micro.py:18-265`` — one
effectively infinite micro lane with ``n_vehicle`` default-parameter IDM
vehicles spaced ~4 lengths apart; recover initial (position, speed) from the
end state. Defaults match the reference (10 vehicles, dt = 0.01, 500 steps,
Adam lr 1e-2, per-vehicle position window bounds of 2 vehicle lengths).

Run: ``python -m dhts.apps.inverse.micro [--n_vehicle 10 ...]``
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np

from dhts.apps.inverse.problem import InverseProblem
from dhts.models import lane
from dhts.models.network import (DEFAULT_HEAD_POSITION_DELTA,
                                 DEFAULT_HEAD_SPEED_DELTA)
from dhts.models.vehicle import default_params


class MicroInverseProblem(InverseProblem):

    def __init__(self, num_trial, num_timestep, num_episode, delta_time,
                 speed_limit, run_name, num_vehicle, vehicle_length,
                 gd_lr=1e-2, use_pallas: bool = False, **kw):
        super().__init__(num_trial, num_timestep, num_episode, delta_time,
                         speed_limit, run_name, gd_lr=gd_lr, **kw)
        self.num_vehicle = num_vehicle
        self.vehicle_length = vehicle_length
        self.params = default_params(speed_limit, (num_vehicle,),
                                     vehicle_length)
        self.active = jnp.ones(num_vehicle, bool)
        self.use_pallas = use_pallas
        self._fused_cache = {}

    def build_scene(self, rng):
        pass  # a single unbounded lane; nothing scene-random

    def random_initial_state(self, rng):
        n, vl = self.num_vehicle, self.vehicle_length
        if self.true_state is None:
            start = np.arange(n) * 4.0 * vl
            pos = start + rng.uniform(0, 1, n) * 2.0 * vl
            spd = (0.3 + 0.4 * rng.uniform(0, 1, n)) * self.speed_limit
            return (jnp.asarray(pos, jnp.float32), jnp.asarray(spd,
                                                               jnp.float32))
        lb, ub = self.bounds()
        pos = np.asarray(self.true_state[0]) + rng.normal(size=n) * 0.1 * vl
        spd = (np.asarray(self.true_state[1]) +
               rng.normal(size=n) * 1e-2 * self.speed_limit)
        return (jnp.asarray(np.clip(pos, lb[0], ub[0]), jnp.float32),
                jnp.asarray(np.clip(spd, lb[1], ub[1]), jnp.float32))

    def _fused(self, batch):
        if batch not in self._fused_cache:
            from dhts.ops.pallas import make_fused_micro_rollout
            self._fused_cache[batch] = make_fused_micro_rollout(
                self.delta_time, self.num_timestep, self.num_vehicle, batch,
                self.params, DEFAULT_HEAD_POSITION_DELTA,
                DEFAULT_HEAD_SPEED_DELTA)
        return self._fused_cache[batch]

    def end_state_of(self, est, differentiable):
        if self.use_pallas:
            pT, vT = self._fused(1)(est[0][None, :], est[1][None, :])
            return pT[0], vT[0]
        res = lane.micro_rollout(est[0], est[1], self.params, self.active,
                                 DEFAULT_HEAD_POSITION_DELTA,
                                 DEFAULT_HEAD_SPEED_DELTA, self.delta_time,
                                 self.num_timestep)
        return res.position, res.speed

    def _build_losses(self):
        super()._build_losses()
        if not self.use_pallas:
            return
        import jax

        def batch_fn(vs):
            n = self.num_vehicle
            pT, vT = self._fused(vs.shape[0])(vs[:, :n], vs[:, n:])
            tp, tv = self.target_end
            return (jnp.sum((pT - tp) ** 2, axis=1) +
                    jnp.sum((vT - tv) ** 2, axis=1))

        cache = {}

        def end_error_batch(vs):
            vs = jnp.asarray(vs, jnp.float32)
            B = vs.shape[0]
            if B not in cache:
                cache[B] = jax.jit(batch_fn)
            return cache[B](vs)

        self._end_error_batch = end_error_batch

    def bounds(self):
        n, vl = self.num_vehicle, self.vehicle_length
        pos_lb = jnp.arange(n, dtype=jnp.float32) * 4.0 * vl
        return ((pos_lb, jnp.zeros(n)),
                (pos_lb + 2.0 * vl, jnp.full(n, self.speed_limit)))


def main(argv=None):
    p = argparse.ArgumentParser(
        "Inverse problem: microscopic traffic simulation")
    p.add_argument("--n_trial", type=int, default=5)
    p.add_argument("--n_vehicle", type=int, default=10)
    p.add_argument("--n_timestep", type=int, default=500)
    p.add_argument("--vehicle_length", type=float, default=5.0)
    p.add_argument("--speed_limit", type=float, default=30.0)
    p.add_argument("--delta_time", type=float, default=0.01)
    p.add_argument("--n_episode", type=int, default=100)
    p.add_argument("--methods", type=str,
                   default="gd,cma-es,nelder-mead,slsqp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--run_name", type=str, default=None)
    p.add_argument("--use_pallas", action="store_true",
                   help="time-fused Pallas rollout kernels (TPU)")
    args = p.parse_args(argv)

    run = args.run_name or f"micro_{time.time():.0f}"
    prob = MicroInverseProblem(args.n_trial, args.n_timestep, args.n_episode,
                               args.delta_time, args.speed_limit, run,
                               args.n_vehicle, args.vehicle_length,
                               seed=args.seed,
                               use_pallas=args.use_pallas)
    prob.evaluate(methods=tuple(args.methods.split(",")))


if __name__ == "__main__":
    main()
