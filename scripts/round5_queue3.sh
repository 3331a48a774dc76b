#!/bin/bash
# Round-5 TPU queue #3 (VERDICT r4 #6): VTDINO pretrain on stored
# FakeInsertion frames (online recon probe tracked) + PPO over the frozen
# teacher features at the round-2 recipe budget, comparable to the recorded
# PPO+MAE curve (BASELINE.md: success 1.00 @ ~180k steps).
cd /root/repo || exit 1
mkdir -p runs/r5
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/vtdino_experiment.py \
  --out runs/vtdino --n_frames 20480 --epochs_ssl 20 --total_timesteps 200000 \
  > runs/r5/vtdino.log 2>&1
echo "queue3 done" > runs/r5/queue3.done
