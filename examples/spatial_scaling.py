"""Scale one ITSCP grid scene across a device mesh (spatial sharding).

Runs a hybrid signal-controlled grid whose lane state is sharded over the
``lane`` axis of a 2-D ``(data, lane)`` mesh, with a batch of episodes over
``data`` — the composition for scenes too large for one chip. On a host
without a TPU pod this demonstrates on 8 virtual CPU devices:

    python examples/spatial_scaling.py

Every cross-device read of the simulation step travels as three small
per-lane-summary ``all_gather``s per step (see ``dhts/parallel/spatial.py``);
results are bit-compatible with the unsharded ``env.episode``.
"""

import os
import sys

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import problem_1
from dhts.apps.control.itscp.spatial import make_spatial_episode
from dhts.apps.control.trainer import Trainer
from dhts.parallel.mesh import make_mesh


def main():
    # 3x3 grid, horizon long enough for the flux capacitor to fill (~step
    # 100): the sharded injection / leader-search / conversion machinery
    # actually fires (a 2x2 "hybrid" grid is ALL macro — hybrid = macro
    # border + micro interior and 2x2 has no interior — and would exercise
    # zero vehicle events). Expect a couple of minutes of XLA compile on a
    # small CPU host; the scene is the flagship 144-lane benchmark scene.
    env = ItscpEnv(config=dict(
        num_intersection=3, num_lane=1, lane_length=5.0, speed_limit=20.0,
        cell_length=5.0, policy_length=16, signal_length=2,
        simulation_frequency=10, random_seed=3,
        max_num_micro_vehicle_per_lane=4, mode="hybrid"),
        schedule_fn=problem_1)
    env.reset()
    print(f"scene: {env.spec.num_lanes} lanes, T={env.num_timestep}, "
          f"devices: {len(jax.devices())}")

    # one episode, scene sharded 4 ways
    mesh = make_mesh({"data": 2, "lane": 4})
    episode = make_spatial_episode(env, mesh, differentiable=True)
    action = jnp.full((env.action_size(),), 0.5)
    res = episode(action, jax.random.PRNGKey(0))
    ref = env.episode(action, True, jax.random.PRNGKey(0))
    print(f"sharded reward {float(res.reward):.6f} "
          f"(unsharded {float(ref.reward):.6f})")

    # the same episode through the sharded-FUSED path: per-shard Pallas
    # step kernels between the summary all_gathers (11x the sharded-scan
    # per-step cost on a real TPU; interpret-mode Pallas here on CPU)
    from dhts.ops.pallas.itscp_spatial_step import make_fused_spatial_episode
    from dhts.parallel.mesh import make_mesh as _mm
    lane_mesh = _mm({"lane": 4})
    fused = make_fused_spatial_episode(env, lane_mesh, differentiable=True)
    resf = fused(action, jax.random.PRNGKey(0))
    print(f"sharded-FUSED reward {float(resf.reward):.6f} "
          f"(scan-sharded {float(res.reward):.6f})")

    # two training epochs through the 2-D (data, lane) train step
    tr = Trainer(env, network_size=(16, 16), lr=1e-2, seed=0, mesh=mesh)
    hist = tr.train(num_episode_per_epoch=2, num_epoch=2, num_eval_epoch=1,
                    num_eval_episode=1, log_path="result/spatial_demo",
                    verbose=True)
    print("train losses:", [round(h, 4) for h in hist])


if __name__ == "__main__":
    main()
