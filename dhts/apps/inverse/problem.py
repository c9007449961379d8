"""Inverse initial-state estimation harness.

Functional parity with the reference benchmark framework
(``example/inverse/_inverse.py:16-594``): given a randomly built scene and a
random *true* initial state, roll the simulator ``num_timestep`` steps to
record a target end state, then recover an initial state that reproduces it,
comparing four optimizers —

* **GD (ours)**: Adam on gradients from the differentiable simulator
  (reference ``solve_gd`` at ``_inverse.py:185-242``; here ``optax.adam`` on
  a jitted ``value_and_grad`` of the whole rollout — one device program per
  episode instead of 500 Python-stepped graph builds),
* **CMA-ES** (``solve_cma``, ``_inverse.py:245-299``; here dhts's own
  :class:`dhts.utils.cma_es.CmaEs` with *vmapped population evaluation* — a
  whole generation is one device program),
* **Nelder-Mead** and **SLSQP** via scipy (``solve_scipy``,
  ``_inverse.py:302-348``), including the reference's early-termination
  padding bugfix.

Per-trial logs are written as ``<dir>/<method>/trial_k.txt`` with one
"beg_error end_error" line per episode — the same format as the reference's
stored baselines (``example/_result/inverse/**``) so curves are directly
comparable — and a mean±std log-scale comparison graph is rendered.

The optimized state is always a pair of vectors ``(a, b)`` (density+speed or
position+speed); subclasses define how it maps into the simulator.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dhts.utils.cma_es import CmaEs

try:
    import optax
except ImportError:  # pragma: no cover - optax is a standard dep here
    optax = None


class InverseProblem:
    """Abstract harness; subclasses implement the scene + state mapping.

    Required overrides:
      * ``build_scene(rng)``            — construct scene/state for a trial
      * ``random_initial_state(rng)``   — draw a random ``(a, b)`` state
        (perturb ``self.true_state`` if it exists, like the reference's
        ``random_initial_state`` with ``beg_state`` set)
      * ``end_state_of(est, differentiable)`` — pure, jittable: roll the
        simulator from ``est`` and return the compared end state ``(a, b)``
      * ``bounds()``                    — ``(lb, ub)`` pairs of vectors
    """

    def __init__(self, num_trial: int, num_timestep: int, num_episode: int,
                 delta_time: float, speed_limit: float, run_name: str,
                 gd_lr: float = 1e-3, cma_sigma: float = 1.0,
                 log_root: str = "result/inverse", seed: int = 0):
        self.num_trial = num_trial
        self.num_timestep = num_timestep
        self.num_episode = num_episode
        self.delta_time = delta_time
        self.speed_limit = speed_limit
        self.gd_lr = gd_lr
        self.cma_sigma = cma_sigma
        self.seed = seed
        self.log_dir = os.path.join(log_root, run_name)
        os.makedirs(self.log_dir, exist_ok=True)
        self.true_state = None
        self.target_end = None

    # -- abstract --------------------------------------------------------

    def build_scene(self, rng: np.random.Generator):
        raise NotImplementedError

    def random_initial_state(self, rng: np.random.Generator):
        raise NotImplementedError

    def end_state_of(self, est, differentiable: bool):
        raise NotImplementedError

    def bounds(self):
        raise NotImplementedError

    # -- shared machinery -------------------------------------------------

    @staticmethod
    def state_error(sa, sb):
        """Sum of squared differences over both state vectors (the MSE the
        reference uses for beg and end errors, e.g. ``macro.py:209-241``)."""
        return jnp.sum((sa[0] - sb[0]) ** 2) + jnp.sum((sa[1] - sb[1]) ** 2)

    def initialize(self, rng: np.random.Generator):
        """Build a trial: scene, true state, simulated target end state."""
        self.build_scene(rng)
        self.true_state = None
        self.true_state = jax.tree.map(jnp.asarray,
                                       self.random_initial_state(rng))
        self.target_end = jax.tree.map(
            jax.lax.stop_gradient,
            jax.jit(lambda s: self.end_state_of(s, False))(self.true_state))

        self._build_losses()

    def _build_losses(self):
        """Compile the per-trial loss functions (override to swap kernels)."""

        def end_error(est, differentiable):
            return self.state_error(self.target_end,
                                    self.end_state_of(est, differentiable))

        self._end_error_hard = jax.jit(lambda e: end_error(e, False))
        self._end_error_soft = jax.jit(lambda e: end_error(e, True))
        self._end_error_grad = jax.jit(
            jax.value_and_grad(lambda e: end_error(e, True)))
        n = self.true_state[0].shape[0]
        self._split = lambda v: (jnp.asarray(v[..., :n], jnp.float32),
                                 jnp.asarray(v[..., n:], jnp.float32))
        self._end_error_batch = jax.jit(
            jax.vmap(lambda v: end_error(self._split(v), False)))

    def beg_error(self, est):
        return float(self.state_error(self.true_state, est))

    # -- solvers ----------------------------------------------------------

    def _gd_solver(self, grad_fn):
        """Shared Adam-on-simulator-gradients scan: ``fn(est) -> (est,
        begs, ends)`` with ``num_episode`` x (rollout, backward, Adam
        update, box projection) as ONE ``lax.scan``. ``grad_fn(est) ->
        (end_error, grads)`` supplies the gradient (solve_gd uses the
        problem's fused/custom path, restarts a plain value_and_grad)."""
        opt = optax.adam(self.gd_lr)
        lb, ub = self.bounds()
        true_state = self.true_state

        def run(est):
            def episode(carry, _):
                est, opt_state = carry
                beg = self.state_error(true_state, est)
                val, grads = grad_fn(est)
                updates, opt_state = opt.update(grads, opt_state)
                est = optax.apply_updates(est, updates)
                est = jax.tree.map(jnp.clip, est, lb, ub)
                return (est, opt_state), (beg, val)

            (est, _), (begs, ends) = jax.lax.scan(
                episode, (est, opt.init(est)), None,
                length=self.num_episode)
            return est, begs, ends

        return run

    def solve_gd(self, est0, progress: Callable | None = None):
        """Adam on simulator gradients; box-projected after each step.

        TPU-first: the ENTIRE optimization — ``num_episode`` x (rollout,
        backward, Adam update, box projection) — is one ``lax.scan`` inside
        one jitted device program, vs the reference's per-episode Python
        loop re-taping 500 graph steps (``_inverse.py:185-242``).
        """
        assert optax is not None, "optax required for solve_gd"
        est = jax.tree.map(jnp.asarray, est0)
        run = jax.jit(self._gd_solver(self._end_error_grad))
        est, begs, ends = run(est)
        if progress:
            progress("GD", self.num_episode - 1, float(ends[-1]))
        return np.asarray(begs).tolist(), np.asarray(ends).tolist()

    def solve_gd_restarts(self, est0_batch, progress: Callable | None = None):
        """Multi-restart GD: B independent Adam trajectories, vmapped.

        The whole population of restarts — every episode of every restart's
        rollout, backward pass and optimizer update — runs as ONE device
        program. This is the scenario-batch axis the reference cannot
        express (its optimization loop is Python); on TPU it is nearly free
        until the chip saturates. ``est0_batch``: pytree pair with leading
        restart axis ``[B, n]``. Returns ``(beg[B, E], end[B, E], best_est)``.
        """
        assert optax is not None, "optax required for solve_gd_restarts"
        run_one = self._gd_solver(jax.value_and_grad(
            lambda e: self.state_error(self.target_end,
                                       self.end_state_of(e, True))))
        ests, begs, ends = jax.jit(jax.vmap(run_one))(
            jax.tree.map(jnp.asarray, est0_batch))
        final = np.asarray(ends[:, -1])
        best = int(np.argmin(final))
        if progress:
            progress("GDxB", self.num_episode - 1, float(final[best]))
        return (np.asarray(begs), np.asarray(ends),
                jax.tree.map(lambda x: x[best], ests))

    def solve_cma(self, est0, progress: Callable | None = None):
        """CMA-ES with vmapped population evaluation on device."""
        lb, ub = self.bounds()
        x0 = np.concatenate([np.asarray(est0[0]), np.asarray(est0[1])])
        es = CmaEs(x0, self.cma_sigma,
                   lower=np.concatenate([np.asarray(lb[0]),
                                         np.asarray(lb[1])]),
                   upper=np.concatenate([np.asarray(ub[0]),
                                         np.asarray(ub[1])]),
                   seed=self.seed)
        history, asked, _ = es.optimize(
            lambda xs: self._end_error_batch(jnp.asarray(xs, jnp.float32)),
            self.num_episode)
        beg_errors = [self.beg_error(self._split(jnp.asarray(x)))
                      for x in asked]
        if progress:
            progress("CMA", self.num_episode - 1, float(history[-1]))
        return beg_errors, history.tolist()

    def solve_scipy(self, est0, method: str,
                    progress: Callable | None = None):
        """Nelder-Mead / SLSQP on the jitted forward loss."""
        import scipy.optimize

        lb, ub = self.bounds()
        bounds = scipy.optimize.Bounds(
            np.concatenate([np.asarray(lb[0]), np.asarray(lb[1])]),
            np.concatenate([np.asarray(ub[0]), np.asarray(ub[1])]))
        x0 = np.concatenate([np.asarray(est0[0]), np.asarray(est0[1])])
        beg_errors, end_errors = [], []

        def fun(v):
            est = self._split(jnp.asarray(v, jnp.float32))
            e = float(self._end_error_hard(est))
            beg_errors.append(self.beg_error(est))
            end_errors.append(e)
            return e

        scipy.optimize.minimize(fun, x0, bounds=bounds, method=method,
                                options={"maxiter": self.num_episode + 1})
        # early termination (notably SLSQP with a zero FD gradient) is
        # padded with the last value, as in the reference
        # (_inverse.py:333-346)
        while len(end_errors) < self.num_episode:
            beg_errors.append(beg_errors[-1])
            end_errors.append(end_errors[-1])
        if progress:
            progress(method, self.num_episode - 1, end_errors[-1])
        return (beg_errors[: self.num_episode],
                end_errors[: self.num_episode])

    # -- evaluation loop --------------------------------------------------

    METHODS = ("gd", "cma-es", "nelder-mead", "slsqp")

    def evaluate(self, methods=METHODS, verbose=True):
        """Run all trials x methods, log per-episode errors, render graphs."""
        all_beg = {m: [] for m in methods}
        all_end = {m: [] for m in methods}
        rng = np.random.default_rng(self.seed)

        for trial in range(self.num_trial):
            if verbose:
                print(f"Trial # {trial}")
            self.initialize(rng)
            est0 = jax.tree.map(jnp.asarray, self.random_initial_state(rng))

            prog = (lambda m, ep, v: print(f"  {m}: ep {ep} err {v:.6g}")) \
                if verbose else None
            for m in methods:
                if m == "gd":
                    beg, end = self.solve_gd(est0)
                elif m == "cma-es":
                    beg, end = self.solve_cma(est0)
                elif m == "nelder-mead":
                    beg, end = self.solve_scipy(est0, "Nelder-Mead")
                elif m == "slsqp":
                    beg, end = self.solve_scipy(est0, "SLSQP")
                else:
                    raise ValueError(m)
                if prog:
                    prog(m, self.num_episode - 1, end[-1])
                all_beg[m].append(beg)
                all_end[m].append(end)
                mdir = os.path.join(self.log_dir, m)
                os.makedirs(mdir, exist_ok=True)
                with open(os.path.join(mdir, f"trial_{trial}.txt"), "w") as f:
                    for b, e in zip(beg, end):
                        f.write(f"{b} {e}\n")

        self.render_graph(os.path.join(self.log_dir,
                                       "beg_optimization_graph.png"), all_beg)
        self.render_graph(os.path.join(self.log_dir,
                                       "end_optimization_graph.png"), all_end)
        return all_beg, all_end

    @staticmethod
    def render_graph(path, errors_by_method):
        """Mean±std log-scale convergence comparison plot."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        labels = {"gd": "Ours", "cma-es": "CMAES",
                  "nelder-mead": "Nelder-Mead", "slsqp": "SLSQP"}
        plt.figure(figsize=(10, 7))
        for m, runs in errors_by_method.items():
            if not runs:
                continue
            arr = np.asarray(runs)
            x = np.arange(1, arr.shape[1] + 1)
            mean, std = arr.mean(0), arr.std(0)
            plt.plot(x, mean, label=labels.get(m, m), linewidth=2.5)
            plt.fill_between(x, np.maximum(mean - std, mean / 3.0),
                             mean + std, alpha=0.2)
        plt.yscale("log")
        plt.xlabel("Episode")
        plt.ylabel("Loss")
        plt.legend()
        plt.grid(alpha=0.3)
        plt.savefig(path, dpi=110, bbox_inches="tight")
        plt.close()
