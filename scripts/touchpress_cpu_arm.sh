#!/bin/bash
# CPU-JAX fallback for one TouchPress ablation arm, used while the TPU
# relay is degraded. Same hyperparameters and tensorboard/checkpoint dir
# as scripts/touchpress_pixel_ablation.sh, so the TPU queue can kill this
# process (via /tmp/cpu_arm.pid) and continue the SAME run on the chip
# with --resume_from auto. In-process envs (EGL tolerates in-process with
# CPU JAX) and nice 19 so TPU-health probes keep priority on the 1-core host.
# Usage: bash scripts/touchpress_cpu_arm.sh [arm] [total_timesteps]
set -u
cd "$(dirname "$0")/.."
ARM=${1:-vision_and_touch}
STEPS=${2:-400000}
mkdir -p runs/touchpress
echo $$ > /tmp/cpu_arm.pid
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo
echo "=== [$(date +%H:%M:%S)] CPU fallback arm: $ARM ($STEPS steps) ===" >> "runs/touchpress/${ARM}.log"
exec nice -n 19 python -u -m m3l_tpu.cli.train \
  --env MuJoCoPixels/TouchPress-v0 --state_type "$ARM" \
  --n_envs 32 --subproc False \
  --total_timesteps "$STEPS" --rollout_length 8192 \
  --dim_embedding 128 --frame_stack 2 --lr_ppo 3e-4 \
  --batch_size 512 --ppo_epochs 10 \
  --save_freq 49152 --resume_from auto --eval_every 100000000 \
  --tensorboard_dir "runs/touchpress/$ARM" \
  --allow_fake False --verbose 1 \
  >> "runs/touchpress/${ARM}.log" 2>&1
