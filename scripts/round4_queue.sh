#!/bin/bash
# Round-4 TPU work queue, in VERDICT-priority order but with the short
# benches first so a driver-verifiable headline lands before the multi-hour
# flagship runs occupy the chip. Run under run_when_tpu_healthy.sh.
# The host has ONE core: wait for any running pytest to exit first
# (heavy host work starves the relay client - CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
# scripts/*.py put scripts/ (not the repo root) on sys.path; keep the axon
# site too or the TPU backend fails to register (CLAUDE.md)
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
mkdir -p runs/r4

while pgrep -x pytest >/dev/null 2>&1 || ps -eo args | grep -E '^[/a-z]*python[0-9.]* -m pytest' >/dev/null 2>&1; do
  echo "[$(date +%H:%M:%S)] pytest still running; queue waiting 60s"
  sleep 60
done

# Stop any CPU-fallback ablation arm (touchpress_cpu_arm.sh): it shares the
# checkpoint dir, so the TPU ablation below resumes exactly where it died.
if [ -f /tmp/cpu_arm.pid ] && kill -0 "$(cat /tmp/cpu_arm.pid)" 2>/dev/null; then
  echo "[$(date +%H:%M:%S)] stopping CPU-fallback arm pid $(cat /tmp/cpu_arm.pid)"
  kill "$(cat /tmp/cpu_arm.pid)"
  for _ in $(seq 1 30); do kill -0 "$(cat /tmp/cpu_arm.pid)" 2>/dev/null || break; sleep 2; done
  kill -9 "$(cat /tmp/cpu_arm.pid)" 2>/dev/null
  rm -f /tmp/cpu_arm.pid
fi

run() {
  local name=$1; shift
  echo "=== [$(date +%H:%M:%S)] queue: $name ==="
  "$@" > "runs/r4/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? ==="
}

run bench_headline python -u bench.py
run bench_full python -u bench.py --full
run bench_ssl python -u scripts/bench_ssl.py
run bench_layernorm python -u scripts/bench_layernorm.py
run touchpress_ablation bash scripts/touchpress_pixel_ablation.sh 400000
run dino_texture python -u scripts/transfer_experiment.py \
  --out runs/transfer_texture --algos dino,mae --tasks texture --textures 6 \
  --regimes pretrained,random --epochs_ssl 100 --epochs_probe 8 --verbose 1
run touchpress_sac bash scripts/touchpress_sacmae.sh 250000
echo "=== [$(date +%H:%M:%S)] queue complete ==="
