#!/bin/bash
# Round-5 TPU queue #2:
# 1. Resume the interrupted mae texture pretrain (round-4 end-of-round SIGTERM
#    left an 8/45-epoch ckpt that the replication then evaluated — the
#    0.785 -> 0.180 discrepancy) and retrain the mae-frozen texture probe
#    under the drop_last=False protocol.
# 2. Re-run feature_diag with the completed encoders (incl. vjepa).
# 3. T3 pose + T4 grasp (+ force re-run) transfer arms on runs/transfer
#    (VERDICT r4 #5) — pretrains the mae encoder there (purged in r4 slimming).
# 4. Force-field training to a result (VERDICT r4 #3) using that encoder.
cd /root/repo || exit 1
mkdir -p runs/r5
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/transfer_experiment.py \
  --out runs/transfer_texture --algos mae --tasks texture --textures 6 \
  --regimes pretrained --epochs_ssl 45 --epochs_probe 8 \
  > runs/r5/mae_texture_fix.log 2>&1
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/feature_diag.py \
  --out runs/transfer_texture > runs/r5/feature_diag_r5b.log 2>&1
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/transfer_experiment.py \
  --out runs/transfer --algos mae --tasks force,pose,grasp \
  --regimes pretrained,random,e2e --epochs_ssl 30 --epochs_probe 8 \
  > runs/r5/pose_grasp.log 2>&1
PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/forcefield_experiment.py \
  --out runs/forcefield --encoder_ckpt runs/transfer/ssl_mae/last.ckpt --epochs 12 \
  > runs/r5/forcefield.log 2>&1
echo "queue2 done" > runs/r5/queue2.done
