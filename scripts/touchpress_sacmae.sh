#!/bin/bash
# SAC+MAE on real MuJoCo physics from pixels (VERDICT r3 item #6): the
# off-policy HBM-ring path beyond FakeInsertion. Round-2 converging recipe
# (separate optimizer, raw rewards, gamma 0.98, device ring) adapted to
# TouchPress-v0 with --subproc True (EGL cannot share the TPU-client
# process) and update:data ratio 0.25 (32 envs -> 8 fused gradient steps).
# Usage: bash scripts/touchpress_sacmae.sh [total_timesteps]
set -u
cd "$(dirname "$0")/.."
STEPS=${1:-250000}
mkdir -p runs/touchpress
python -u -m m3l_tpu.cli.train_sacmae \
  --env MuJoCoPixels/TouchPress-v0 --state_type vision_and_touch \
  --n_envs 32 --subproc True \
  --total_timesteps "$STEPS" \
  --dim_embedding 128 --frame_stack 2 \
  --learning_rate 3e-4 --gamma 0.98 --norm_reward False \
  --batch_size 256 --gradient_steps 8 --train_freq 1 \
  --buffer_size 150000 --learning_starts 5000 \
  --device_buffer True --separate_optimizer True \
  --save_freq 100000000 --eval_every 100000000 \
  --tensorboard_dir runs/touchpress/sac_vision_and_touch \
  --allow_fake False --verbose 1 \
  > runs/touchpress/sac_vision_and_touch.log 2>&1
echo "sac arm exited rc=$?"
