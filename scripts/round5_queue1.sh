#!/bin/bash
# Round-5 TPU queue #1 (VERDICT r4 #2 + ADVICE #3):
# 1. V-JEPA texture arm (45-epoch pretrain + probe) PLUS re-evaluation of the
#    mae/dino/random texture arms under the drop_last=False eval protocol
#    (the r4 arms mixed 2816- and 2940-window test sets).
# 2. V-JEPA force arm in runs/transfer (30 epochs, matching the r3 arms).
# 3. feature_diag with the vjepa arm (collapse diagnosis).
cd /root/repo || exit 1
mkdir -p runs/r5
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/transfer_experiment.py \
  --out runs/transfer_texture --algos vjepa,mae,dino --tasks texture --textures 6 \
  --regimes pretrained,random --epochs_ssl 45 --epochs_probe 8 \
  > runs/r5/vjepa_texture.log 2>&1
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/transfer_experiment.py \
  --out runs/transfer --algos vjepa --tasks force --regimes pretrained \
  --epochs_ssl 30 --epochs_probe 8 \
  > runs/r5/vjepa_force.log 2>&1
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/feature_diag.py \
  --out runs/transfer_texture > runs/r5/feature_diag_r5.log 2>&1
echo "queue1 done" > runs/r5/queue1.done
