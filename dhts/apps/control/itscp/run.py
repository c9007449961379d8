"""ITSCP training entry point.

Parity target: reference ``example/control/itscp/run.py:10-71`` and the
shell presets ``run_itscp_{macro,micro,hybrid}.sh``. Defaults mirror the
reference CLI; e.g. the hybrid preset is
``--mode hybrid --n_intersection 3 --n_lane 1 --lane_length 5
--simulation_length 20 --signal_length 4 --lr 1e-4``.

Run: ``python -m dhts.apps.control.itscp.run --mode macro --problem 1 ...``
"""

from __future__ import annotations

import argparse
import json
import os
import time

from dhts.apps.control.itscp.env import ItscpEnv
from dhts.apps.control.itscp.problem import PROBLEMS
from dhts.apps.control.trainer import Trainer


def _warm_start_params(params, json_path, env):
    """Overwrite the controller HEAD so squash(model(obs)) reproduces a
    CMA-ES per-intersection floor action (``bench/itscp_floor.py --cma
    per_int`` JSON): head kernel zeroed, head bias = the action logits.
    Hidden layers keep their random init; the head kernel's gradient is
    nonzero from step one, so fine-tuning proceeds normally."""
    import json as _json

    import jax.numpy as jnp
    import numpy as np

    with open(json_path) as f:
        ws = _json.load(f)
    x = np.asarray(ws["cma_per_int_best_x"], np.float64)
    lo, hi = env.action_bounds()
    n_phases = env.action_size() // x.size
    tgt = np.tile(x, n_phases)
    pr = np.clip((tgt - lo) / (hi - lo), 1e-4, 1.0 - 1e-4)
    raw = np.log(pr / (1.0 - pr))  # inverse of squash_action's sigmoid

    pd = {k: dict(v) for k, v in params["params"].items()}
    head = max((k for k in pd if k.startswith("Dense")),
               key=lambda k: int(k.split("_")[1]))
    assert pd[head]["bias"].shape == raw.shape, \
        (pd[head]["bias"].shape, raw.shape)
    pd[head] = {"kernel": jnp.zeros_like(pd[head]["kernel"]),
                "bias": jnp.asarray(raw, jnp.float32)}
    return {"params": pd}


def main(argv=None):
    p = argparse.ArgumentParser("Intersection signal control (ITSCP)")
    p.add_argument("--mode", choices=["macro", "micro", "hybrid"],
                   default="macro")
    p.add_argument("--problem", type=int, choices=[0, 1, 2, 3], default=1,
                   help="0 = random schedule; 1-3 = sessioned NS/WE problems")
    p.add_argument("--n_trial", type=int, default=5)
    p.add_argument("--n_intersection", type=int, default=1)
    p.add_argument("--n_lane", type=int, default=3)
    p.add_argument("--lane_length", type=float, default=20.0)
    p.add_argument("--speed_limit", type=float, default=60.0)
    p.add_argument("--simulation_length", type=int, default=10,
                   help="policy length in seconds")
    p.add_argument("--signal_length", type=int, default=2)
    p.add_argument("--n_episode", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_schedule", choices=["const", "cosine"],
                   default="const",
                   help="cosine: warmup + cosine decay over n_episode "
                        "epochs (stabilizes long runs at 5x5+)")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off)")
    p.add_argument("--ep_per_epoch", type=int, default=1,
                   help="episodes (random injection draws) averaged per "
                        "update; reference uses 1, larger values cut "
                        "gradient noise at big grids")
    p.add_argument("--n_eval_episode", type=int, default=1,
                   help="hard-mode episodes averaged per eval point "
                        "(fixed held-out keys: the curve is comparable "
                        "across epochs)")
    p.add_argument("--gate_mode", choices=["soft", "st"], default="soft",
                   help="st: straight-through gates — train on the HARD "
                        "queue metric with soft gradients (no soft/hard "
                        "surrogate gap); soft: reference parity")
    p.add_argument("--soft_gate_scale", type=float, default=1.0,
                   help="sharpen the SOFT signal gates by this factor "
                        "(training only; hard eval unchanged). >1 narrows "
                        "the soft/hard surrogate gap that 5x5 training "
                        "exploits after ~40 epochs")
    p.add_argument("--warm_start", type=str, default=None, metavar="JSON",
                   help="warm-start the controller from a CMA-ES floor "
                        "solution (bench/itscp_floor.py --cma per_int "
                        "output containing cma_per_int_best_x): the head "
                        "kernel is zeroed and its bias set to the logits "
                        "reproducing the CMA action, so gradient training "
                        "fine-tunes from the best known static plan "
                        "instead of a random policy")
    p.add_argument("--eval_every", type=int, default=0, metavar="N",
                   help="hard-eval every N epochs (0 = the legacy "
                        "n_episode//10 cadence). Fine-tune runs want 1: "
                        "the hard metric is PIECEWISE CONSTANT in the "
                        "action (signal-progress grid 1/nsf), so best-"
                        "checkpointing must sample densely to harvest "
                        "the occasional grid-cell crossing that helps")
    p.add_argument("--carry", choices=["last", "best"], default="last",
                   help="what parameters cross --anneal_gates stage "
                        "boundaries: the stage's final params (legacy) "
                        "or its best-eval checkpoint (fine-tunes drift "
                        "off a warm start; 'best' re-anchors each stage)")
    p.add_argument("--anneal_gates", type=str, default=None,
                   metavar="S:E,S:E,...",
                   help="staged gate-scale annealing: comma-separated "
                        "soft_gate_scale:epochs stages (e.g. '1:100,2:100,"
                        "4:100,8:100'). Each stage rebuilds the soft kernel "
                        "at that scale and warm-restarts Adam + the cosine "
                        "schedule with the previous stage's params, so the "
                        "surrogate sharpens toward the hard metric as "
                        "training converges (the 5x5 runs exploit a fixed "
                        "soft gap after ~40 epochs). Overrides "
                        "--soft_gate_scale/--n_episode")
    p.add_argument("--network_size", type=int, nargs=2, default=(256, 256),
                   help="controller hidden widths (reference: 256 256; "
                        "wider helps 25-intersection action heads)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_root", type=str, default="result/control/itscp")
    p.add_argument("--fused_episode", action="store_true",
                   help="train through the whole-episode Pallas kernels "
                        "(all modes; ~3x macro / ~13x hybrid on TPU)")
    p.add_argument("--mesh", type=str, default=None, metavar="D,L",
                   help="train spatially sharded on a 2-D (data, lane) "
                        "device mesh, e.g. '2,4': the episode batch over "
                        "D devices, each episode's SCENE over L devices "
                        "(for grids too large for one chip); lanes must "
                        "divide L")
    p.add_argument("--mesh_fused", action="store_true",
                   help="with --mesh: run each shard's step as fused "
                        "Pallas kernels between the summary collectives "
                        "(11x the sharded-scan per-step cost on TPU)")
    p.add_argument("--packed", type=int, default=0, metavar="B",
                   help="train against B scenarios PACKED side by side in "
                        "one fused kernel instance (implies "
                        "--fused_episode; small scenes only — measured "
                        "1.4x aggregate at the 1x1 macro preset, slower "
                        "than vmap at 3x3+)")
    p.add_argument("--wide_ops", action="store_true",
                   help="with --fused_episode: build the kernel with the "
                        "wide-row op-stream restructuring (value-identical; "
                        "see ops/pallas/itscp_hybrid_episode.py wide_ops)")
    args = p.parse_args(argv)
    if args.packed:
        args.fused_episode = True
        assert not args.mesh, "--packed and --mesh are mutually exclusive"

    env = ItscpEnv(config=dict(
        num_intersection=args.n_intersection, num_lane=args.n_lane,
        lane_length=args.lane_length, speed_limit=args.speed_limit,
        policy_length=args.simulation_length,
        signal_length=args.signal_length, mode=args.mode,
        random_seed=args.seed,
        use_fused_episode=args.fused_episode,
        soft_gate_scale=args.soft_gate_scale,
        gate_mode=args.gate_mode,
        use_wide_ops=args.wide_ops or None),
        schedule_fn=PROBLEMS[args.problem])

    mesh = None
    if args.mesh:
        from dhts.parallel.mesh import make_mesh

        d, l = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh({"data": d, "lane": l})

    run_name = os.path.join(args.log_root,
                            f"{args.mode}_{int(time.time())}")

    if args.anneal_gates:
        assert not (args.mesh or args.packed), \
            "--anneal_gates supports the single-device paths only"
        stages = [(float(s.split(":")[0]), int(s.split(":")[1]))
                  for s in args.anneal_gates.split(",")]
        for trial in range(args.n_trial):
            log_path = os.path.join(run_name, f"trial_{trial}")
            os.makedirs(log_path, exist_ok=True)
            with open(os.path.join(log_path, "stages.json"), "w") as f:
                json.dump({"anneal_gates": stages}, f)
            params = None
            best = -float("inf")
            offset = 0
            for si, (scale, n_ep) in enumerate(stages):
                env = ItscpEnv(config=dict(
                    num_intersection=args.n_intersection,
                    num_lane=args.n_lane, lane_length=args.lane_length,
                    speed_limit=args.speed_limit,
                    policy_length=args.simulation_length,
                    signal_length=args.signal_length, mode=args.mode,
                    random_seed=args.seed,
                    use_fused_episode=args.fused_episode,
                    soft_gate_scale=scale, gate_mode=args.gate_mode,
                    use_wide_ops=args.wide_ops or None),
                    schedule_fn=PROBLEMS[args.problem])
                env.reset(seed=args.seed + trial if args.seed > 0 else None)
                trainer = Trainer(env, lr=args.lr, seed=args.seed + trial,
                                  network_size=tuple(args.network_size),
                                  lr_schedule=args.lr_schedule,
                                  schedule_epochs=n_ep,
                                  grad_clip=args.grad_clip)
                if params is not None:
                    trainer.params = params  # warm restart: params only
                elif args.warm_start:
                    trainer.params = _warm_start_params(
                        trainer.params, args.warm_start, env)
                # the last stage gets the trailing +1 epoch so the final
                # eval point lands (reference n_episode+1 convention)
                n = n_ep + (1 if si == len(stages) - 1 else 0)
                cadence = (args.eval_every if args.eval_every > 0 else
                           max(1, sum(e for _, e in stages) // 10))
                trainer.train(max(1, args.ep_per_epoch), n,
                              cadence,
                              max(1, args.n_eval_episode), log_path,
                              initial_best=best, epoch_offset=offset)
                params, best = trainer.params, trainer.best_eval_reward
                best_ckpt = os.path.join(log_path, "best", "model.msgpack")
                if args.carry == "best" and os.path.exists(best_ckpt):
                    from flax import serialization
                    with open(best_ckpt, "rb") as f:
                        blob = f.read()
                    params = serialization.from_bytes(
                        {"params": trainer.params,
                         "opt_state": trainer.opt_state}, blob)["params"]
                offset += n
        return

    for trial in range(args.n_trial):
        if args.packed:
            env.reset_batch(args.packed,
                            seed=args.seed + trial if args.seed > 0
                            else None)
            trainer = Trainer(env, lr=args.lr, seed=args.seed + trial,
                              network_size=tuple(args.network_size),
                              multi_scenario=True, packed=True,
                              lr_schedule=args.lr_schedule,
                              schedule_epochs=args.n_episode + 1,
                              grad_clip=args.grad_clip)
        else:
            env.reset(seed=args.seed + trial if args.seed > 0 else None)
            trainer = Trainer(env, lr=args.lr, seed=args.seed + trial,
                              network_size=tuple(args.network_size),
                              mesh=mesh, mesh_fused=args.mesh_fused,
                              lr_schedule=args.lr_schedule,
                              schedule_epochs=args.n_episode + 1,
                              grad_clip=args.grad_clip)
        log_path = os.path.join(run_name, f"trial_{trial}")
        # reference: 1 episode per epoch; in mesh mode, one episode per
        # data shard per epoch (the batch rides the data axis); packed:
        # one episode per packed scenario per epoch
        ep_per_epoch = (mesh.shape["data"] if mesh is not None
                        else max(1, args.ep_per_epoch))
        trainer.train(ep_per_epoch, args.n_episode + 1,
                      (args.eval_every if args.eval_every > 0 else
                       max(1, args.n_episode // 10)),
                      max(1, args.n_eval_episode), log_path)


if __name__ == "__main__":
    main()
