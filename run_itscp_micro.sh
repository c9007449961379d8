#!/bin/bash
# ITSCP micro preset (parity with the reference's run_itscp_micro.sh)
for p in 1 2 3; do
  python -m dhts.apps.control.itscp.run --mode=micro --problem=$p --n_trial=3 \
    --n_intersection=1 --n_lane=3 --lane_length=30 --speed_limit=60 \
    --simulation_length=10 --signal_length=2 --n_episode=200 --lr=1e-4
done
