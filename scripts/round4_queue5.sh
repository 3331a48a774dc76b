#!/bin/bash
# Round-4 queue #5: (a) fresh perf decomposition snapshot of the fused
# PPO+MAE minibatch (documents how close the round-4 headline sits to the
# measured 132 TF/s GEMM ceiling), then (b) a SECOND SEED of the TouchPress
# pixel ablation — the flagship vision-vs-vision+touch claim reproduced at
# seed 1 so the round-4 headline result is seed-robust, not an n=1 draw.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
mkdir -p runs/r4

run() {
  local name=$1; shift
  echo "=== [$(date +%H:%M:%S)] queue: $name ==="
  "$@" > "runs/r4/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? ==="
}

run profile_update_r4 python -u scripts/profile_update.py
echo "=== [$(date +%H:%M:%S)] queue: touchpress_seed1 ==="
bash scripts/touchpress_pixel_ablation.sh 400000 1 > runs/r4/touchpress_seed1.log 2>&1
echo "=== [$(date +%H:%M:%S)] touchpress_seed1 rc=$? ==="
echo "=== [$(date +%H:%M:%S)] queue complete ==="
