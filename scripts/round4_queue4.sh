#!/bin/bash
# Round-4 queue #4 (post-restart session): DINOv2 + I-JEPA arms of the
# texture-transfer comparison. Round 4's first session showed DINO-v1's
# CLS-only objective fails on trajectory-correlated data (train 0.52 ->
# test 0.19); DINOv2's iBOT patch loss and I-JEPA's latent prediction are
# dense patch-level objectives — this run tests whether the patch-objective
# family transfers where the CLS-objective fails (VERDICT r3 #4 asked for
# "DINO/DINOv2").
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

run dinov2_texture python -u scripts/transfer_experiment.py \
  --out runs/transfer_texture --algos dinov2,ijepa --tasks texture --textures 6 \
  --regimes pretrained --epochs_ssl 45 --epochs_probe 8 --verbose 1
echo "=== [$(date +%H:%M:%S)] queue complete ==="
