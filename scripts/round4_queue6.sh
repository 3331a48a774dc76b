#!/bin/bash
# Round-4 queue #6: (a) re-pretrain the MAE and DINO texture arms (their
# gitignored ssl checkpoints were lost to a VM reboot) — this doubles as a
# same-config replication of the headline texture-transfer numbers; (b) the
# frozen-feature diagnosis across all five arms (effective rank + episode-vs-
# texture similarity structure, VERDICT r3 #4b); (c) queue5's deferred work:
# fresh perf decomposition snapshot + the seed-1 TouchPress pixel ablation
# so the flagship vision-vs-touch claim is seed-robust.
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

run mae_dino_texture_repl python -u scripts/transfer_experiment.py \
  --out runs/transfer_texture --algos mae,dino --tasks texture --textures 6 \
  --regimes pretrained --epochs_ssl 45 --epochs_probe 8 --verbose 1
run feature_diag python -u scripts/feature_diag.py --out runs/transfer_texture
run profile_update_r4 python -u scripts/profile_update.py
echo "=== [$(date +%H:%M:%S)] queue: touchpress_seed1 ==="
bash scripts/touchpress_pixel_ablation.sh 400000 1 > runs/r4/touchpress_seed1.log 2>&1
echo "=== [$(date +%H:%M:%S)] touchpress_seed1 rc=$? ==="
echo "=== [$(date +%H:%M:%S)] queue complete ==="
