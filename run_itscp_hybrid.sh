#!/bin/bash
# ITSCP hybrid preset (parity with the reference's run_itscp_hybrid.sh)
for p in 1 2 3; do
  python -m dhts.apps.control.itscp.run --mode=hybrid --problem=$p --n_trial=1 \
    --n_intersection=3 --n_lane=1 --lane_length=5 --speed_limit=60 \
    --simulation_length=20 --signal_length=4 --n_episode=100 --lr=1e-4
done
