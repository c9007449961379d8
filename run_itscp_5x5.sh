#!/bin/bash
# Beyond-reference-scale preset: 5x5 hybrid ITSCP (400 lanes) through the
# fused whole-episode kernel. The reference's own presets cap at 3x3
# (run_itscp_hybrid.sh); at 5x5 its CPU rate (~3 steps/s) would need ~6h
# per 100-epoch trial, so this scale is only reachable through the
# round-2/3 Pallas kernels (20.2k steps/s fwd+bwd on 1 TPU v5e chip).
for p in "$@"; do
  python -m dhts.apps.control.itscp.run --mode=hybrid --problem=$p --n_trial=1 \
    --n_intersection=5 --n_lane=1 --lane_length=5 --speed_limit=60 \
    --simulation_length=20 --signal_length=4 --n_episode=100 --lr=1e-4 \
    --seed=21 --fused_episode --log_root=result/control/itscp_5x5
done
