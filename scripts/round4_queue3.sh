#!/bin/bash
# Round-4 final queue: DINO-texture evidence at 45 SSL epochs (100 did not
# fit the remaining wall clock at the measured ~85 s/epoch), then the
# SAC-on-real-physics run.
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

run dino_texture python -u scripts/transfer_experiment.py \
  --out runs/transfer_texture --algos dino,mae --tasks texture --textures 6 \
  --regimes pretrained,random --epochs_ssl 45 --epochs_probe 8 --verbose 1
run touchpress_sac bash scripts/touchpress_sacmae.sh 250000
echo "=== [$(date +%H:%M:%S)] queue complete ==="
