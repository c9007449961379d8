"""Inverse problem: macroscopic single-lane initial-state estimation.

Parity target: reference ``example/inverse/macro.py:16-269`` — one ARZ lane
of ``n_cell`` cells with random fixed boundary cells; recover the initial
(density, speed) profile from the end-state profile after ``n_timestep``
steps. Defaults match the reference CLI (10 cells x 5 m, dt = 0.01, 500
steps, 100 episodes, speed limit 30, Adam lr 1e-3).

Run: ``python -m dhts.apps.inverse.macro [--n_cell 10 ...]``
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np

from dhts.apps.inverse.problem import InverseProblem
from dhts.models import lane


class MacroInverseProblem(InverseProblem):

    def __init__(self, num_trial, num_timestep, num_episode, delta_time,
                 speed_limit, run_name, num_cell, cell_length,
                 use_pallas: bool = False, **kw):
        super().__init__(num_trial, num_timestep, num_episode, delta_time,
                         speed_limit, run_name, **kw)
        self.num_cell = num_cell
        self.cell_length = cell_length
        # time-fused Pallas rollout kernel (TPU fast path): the whole T-step
        # rollout + its backward run as single kernels instead of a scan
        self.use_pallas = use_pallas
        self._fused_cache = {}

    def build_scene(self, rng):
        # random boundary ghost cells (reference macro.py:48-49)
        self.bdry_r = rng.uniform(0.0, 1.0, 2).astype(np.float32)
        self.bdry_u = rng.uniform(0.0, self.speed_limit, 2).astype(np.float32)

    def random_initial_state(self, rng):
        n = self.num_cell
        if self.true_state is None:
            return (jnp.asarray(rng.uniform(0, 1, n), jnp.float32),
                    jnp.asarray(rng.uniform(0, self.speed_limit, n),
                                jnp.float32))
        # perturbation of the truth (reference macro.py:91-100)
        r = np.asarray(self.true_state[0]) + rng.normal(size=n) * 1e-2
        u = np.asarray(self.true_state[1]) + rng.normal(size=n) * 1e-2
        return (jnp.asarray(np.clip(r, 0, 1), jnp.float32),
                jnp.asarray(np.clip(u, 0, self.speed_limit), jnp.float32))

    def _fused(self, batch):
        if batch not in self._fused_cache:
            from dhts.ops.pallas import make_fused_macro_rollout
            self._fused_cache[batch] = make_fused_macro_rollout(
                self.speed_limit, self.delta_time, self.cell_length,
                self.num_timestep, self.num_cell, batch)
        return self._fused_cache[batch]

    def end_state_of(self, est, differentiable):
        from dhts.ops import arz

        if self.use_pallas:
            r0 = est[0][None, :]
            y0 = arz.compute_y(r0, est[1][None, :], self.speed_limit)
            rT, yT, _ = self._fused(1)(r0, y0, self.bdry_r[0],
                                       self.bdry_u[0], self.bdry_r[1],
                                       self.bdry_u[1])
            return rT[0], arz.compute_u(rT[0], yT[0], self.speed_limit)
        res = lane.macro_rollout(est[0], est[1], self.bdry_r[0],
                                 self.bdry_u[0], self.bdry_r[1],
                                 self.bdry_u[1], self.speed_limit,
                                 self.delta_time, self.cell_length,
                                 self.num_timestep)
        return res.r, res.u

    def _build_losses(self):
        super()._build_losses()
        if not self.use_pallas:
            return
        # population evaluation through the fused kernel: the batch axis is
        # the kernel's native lane dimension, not a vmap over pallas_call
        import jax

        from dhts.ops import arz

        def batch_fn(vs):
            B = vs.shape[0]
            n = self.num_cell
            r0 = vs[:, :n]
            u0 = vs[:, n:]
            y0 = arz.compute_y(r0, u0, self.speed_limit)
            rT, yT, _ = self._fused(B)(r0, y0, self.bdry_r[0],
                                       self.bdry_u[0], self.bdry_r[1],
                                       self.bdry_u[1])
            uT = arz.compute_u(rT, yT, self.speed_limit)
            tr, tu = self.target_end
            return (jnp.sum((rT - tr) ** 2, axis=1) +
                    jnp.sum((uT - tu) ** 2, axis=1))

        cache = {}

        def end_error_batch(vs):
            vs = jnp.asarray(vs, jnp.float32)
            B = vs.shape[0]
            if B not in cache:
                cache[B] = jax.jit(batch_fn)
            return cache[B](vs)

        self._end_error_batch = end_error_batch

    def bounds(self):
        n = self.num_cell
        lb = (jnp.zeros(n), jnp.zeros(n))
        ub = (jnp.ones(n), jnp.full(n, self.speed_limit))
        return lb, ub


def main(argv=None):
    p = argparse.ArgumentParser(
        "Inverse problem: macroscopic traffic simulation")
    p.add_argument("--n_trial", type=int, default=5)
    p.add_argument("--n_cell", type=int, default=10)
    p.add_argument("--n_timestep", type=int, default=500)
    p.add_argument("--cell_length", type=float, default=5.0)
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

    run = args.run_name or f"macro_{time.time():.0f}"
    prob = MacroInverseProblem(args.n_trial, args.n_timestep, args.n_episode,
                               args.delta_time, args.speed_limit, run,
                               args.n_cell, args.cell_length, seed=args.seed,
                               use_pallas=args.use_pallas)
    prob.evaluate(methods=tuple(args.methods.split(",")))


if __name__ == "__main__":
    main()
