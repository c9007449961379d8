"""dhts quickstart: build, simulate, differentiate, optimize.

Run: ``python examples/quickstart.py`` (CPU is fine; forces cpu below so the
demo is snappy even when a remote TPU backend is registered).
"""

import os
import sys

# importable when run as `python examples/quickstart.py` without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def demo_network():
    """1. Imperative scene construction + hybrid simulation (the reference's
    RoadNetwork workflow)."""
    from dhts.models.api import Network

    net = Network(speed_limit=30.0)
    src = net.add_macro_lane(50.0, cell_length=5.0)  # ARZ continuum
    mid = net.add_micro_lane(50.0)  # IDM vehicles
    dst = net.add_macro_lane(50.0, cell_length=5.0)
    net.connect_lane(src, mid)
    net.connect_lane(mid, dst)
    net.set_macro_state(src, jnp.full(10, 0.7), jnp.full(10, 15.0))
    net.set_boundary(src, left_r=0.7, left_u=15.0)
    net.finalize()

    diags = net.rollout(delta_time=0.02, num_steps=800)
    print(f"[network] emitted {int(jnp.sum(diags.emitted))} vehicles from "
          f"the continuum, absorbed {int(jnp.sum(diags.absorbed))} back; "
          f"{net.num_vehicles(mid)} currently driving on the micro lane")
    r, y, u = net.macro_state(dst)
    print(f"[network] downstream density profile: {np.round(np.asarray(r), 3)}")


def demo_gradients():
    """2. Differentiate through the whole rollout — including the discrete
    emission/absorption events."""
    from dhts.models import lane
    from dhts.ops import arz

    u_max, dt, dx, T = 30.0, 0.01, 5.0, 300

    def end_density(r0, u0):
        res = lane.macro_rollout(r0, u0, 0.4, 12.0, 0.2, 18.0, u_max, dt, dx,
                                 T)
        return jnp.sum(res.r ** 2)

    r0 = jnp.full(10, 0.5)
    u0 = jnp.full(10, 10.0)
    g = jax.grad(end_density, argnums=(0, 1))(r0, u0)
    print(f"[grad] d(end state)/d(initial density)[:3] = "
          f"{np.round(np.asarray(g[0][:3]), 4)}")


def demo_inverse():
    """3. The inverse problem: recover an initial state from the end state
    with Adam on simulator gradients (one device program)."""
    from dhts.apps.inverse.macro import MacroInverseProblem

    prob = MacroInverseProblem(num_trial=1, num_timestep=200, num_episode=60,
                               delta_time=0.01, speed_limit=30.0,
                               run_name="quickstart", num_cell=10,
                               cell_length=5.0, log_root="/tmp/dhts_quick")
    rng = np.random.default_rng(0)
    prob.initialize(rng)
    beg, end = prob.solve_gd(prob.random_initial_state(rng))
    print(f"[inverse] end-state MSE over 60 episodes: {end[0]:.4f} -> "
          f"{end[-1]:.2e}")


def demo_itscp():
    """4. Signal control: train an MLP by backprop through the simulator."""
    from dhts.apps.control.itscp.env import ItscpEnv
    from dhts.apps.control.itscp.problem import problem_1
    from dhts.apps.control.trainer import Trainer

    env = ItscpEnv(config=dict(
        num_intersection=1, num_lane=1, lane_length=20.0, speed_limit=20.0,
        cell_length=5.0, policy_length=10, signal_length=2,
        simulation_frequency=10, random_seed=3, mode="macro"),
        schedule_fn=problem_1)
    env.reset()
    trainer = Trainer(env, network_size=(32, 32), lr=3e-3)
    hist = trainer.train(1, 8, 4, 1, "/tmp/dhts_quick/itscp", verbose=False)
    print(f"[itscp] training loss: {hist[0]:.4f} -> {hist[-1]:.4f}")


if __name__ == "__main__":
    demo_network()
    demo_gradients()
    demo_inverse()
    demo_itscp()
    print("quickstart done")
