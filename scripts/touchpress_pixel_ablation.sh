#!/bin/bash
# TouchPress pixel ablation — the reference's flagship claim through the FULL
# MAE+PPO pixel pipeline (reference README.md:3 / train.py:60 ablation):
#   arm 1: --state_type vision_and_touch  (touch readable -> can regulate force)
#   arm 2: --state_type vision            (hidden gains -> plateaus near the
#                                          vision ceiling, see touchpress_laws.py)
# Round-2 FakeInsertion recipe (dim 128, fs 2, rollout 8192, batch 512 x 10,
# lr 3e-4) but --subproc True: EGL rendering cannot share a process with the
# TPU client. Arms run serially (1 host core + 1 chip).
#
# Tunnel-crash resilience: checkpoints every ~50k steps and, on a nonzero
# exit, waits for the TPU to come back (run_when_tpu_healthy probe) and
# relaunches with --resume_from auto; a completed arm exits the retry loop
# with rc=0 (learn() returns immediately once num_timesteps >= total).
#
# Usage: bash scripts/touchpress_pixel_ablation.sh [total_timesteps] [seed]
# A nonzero seed writes to runs/touchpress/seed<N>/ so auto-resume and TB
# curves stay isolated from the seed-0 headline run.
set -u
cd "$(dirname "$0")/.."
STEPS=${1:-400000}
SEED=${2:-0}
DIR="runs/touchpress"
[ "$SEED" != "0" ] && DIR="runs/touchpress/seed$SEED"
mkdir -p "$DIR"

for ARM in vision_and_touch vision; do
  for ATTEMPT in 1 2 3 4 5 6 7 8; do
    echo "=== [$(date +%H:%M:%S)] TouchPress arm: $ARM ($STEPS steps, seed $SEED, attempt $ATTEMPT) ==="
    python -u -m m3l_tpu.cli.train \
      --env MuJoCoPixels/TouchPress-v0 --state_type "$ARM" \
      --seed "$SEED" \
      --n_envs 32 --subproc True \
      --total_timesteps "$STEPS" --rollout_length 8192 \
      --dim_embedding 128 --frame_stack 2 --lr_ppo 3e-4 \
      --batch_size 512 --ppo_epochs 10 \
      --save_freq 49152 --resume_from auto --eval_every 100000000 \
      --tensorboard_dir "$DIR/$ARM" \
      --allow_fake False --verbose 1 \
      >> "$DIR/${ARM}.log" 2>&1
    RC=$?
    echo "=== [$(date +%H:%M:%S)] arm $ARM attempt $ATTEMPT exited rc=$RC ==="
    [ "$RC" -eq 0 ] && break
    bash scripts/run_when_tpu_healthy.sh /bin/true
  done
done
