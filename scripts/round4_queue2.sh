#!/bin/bash
# Round-4 continuation queue: re-runs the two benches whose first attempts
# died on kernel-compile bugs (fixed: flash-attention vmem-aware blocks,
# fused-LN partial-reduction block shape), then the remaining VERDICT items.
# Takes over from round4_queue.sh: kill that queue's bash (its ablation child
# keeps running), start this with the ablation pid to wait on:
#   bash scripts/round4_queue2.sh <ablation_pid>
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
mkdir -p runs/r4

# Wait for every handed-over pid (the ablation script AND the old queue bash,
# which holds a pending SIGTERM it processes once its foreground child exits).
for WAIT_PID in "$@"; do
  while kill -0 "$WAIT_PID" 2>/dev/null; do
    echo "[$(date +%H:%M:%S)] waiting on pid $WAIT_PID"
    sleep 60
  done
done

run() {
  local name=$1; shift
  echo "=== [$(date +%H:%M:%S)] queue: $name ==="
  "$@" > "runs/r4/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? ==="
}

run bench_ssl python -u scripts/bench_ssl.py
run bench_layernorm python -u scripts/bench_layernorm.py
run dino_texture python -u scripts/transfer_experiment.py \
  --out runs/transfer_texture --algos dino,mae --tasks texture --textures 6 \
  --regimes pretrained,random --epochs_ssl 100 --epochs_probe 8 --verbose 1
run touchpress_sac bash scripts/touchpress_sacmae.sh 250000
echo "=== [$(date +%H:%M:%S)] queue complete ==="
