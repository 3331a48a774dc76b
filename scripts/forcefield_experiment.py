"""Force-field training to a result (VERDICT r4 #3).

Trains the geometry-aware force-field stack (reference
tactile_ssl/downstream_task/forcefield_sl.py:95-412 ForceFieldModule +
utils_forcefield/ssl_utils.py:17-354) end-to-end on synthetic ForceFieldSSL
data (frame-pair + background format, vision_tactile_forcefield.py:93-138)
and records the artifacts the VERDICT asked for: loss curves, integrated
normal/shear force metrics against ground truth, quiver overlays, and an
MAE-frozen vs random-frozen encoder comparison.

Evaluation: the SSL objective trains a dense normal (disparity) + shear
(flow) field; ground truth exists only for the INTEGRATED 3-DoF force
(compute_sl_force, reference forcefield_sl.py:226-242), so the headline
metric is Pearson r / RMSE between the integrated field and the generator's
force labels on held-out trajectories, plus the field-level contact IoU
(predicted disparity mass inside the true contact mask).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/forcefield_experiment.py \
      --out runs/forcefield --encoder_ckpt runs/transfer/ssl_mae/last.ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def get_loader(split: dict, batch_size: int, shuffle=True, seed=0, drop_last=True):
    from m3l_tpu.data.datasets import ArrayDataset, DataLoader

    return DataLoader(ArrayDataset(split), batch_size=batch_size, shuffle=shuffle, seed=seed, drop_last=drop_last)


def build_module(regime: str, ckpt: str | None, dtype, rngs):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from transfer_experiment import build_encoder

    from m3l_tpu.tasks import ForceFieldDecoder, GeometricForceFieldModule

    encoder = build_encoder(rngs, dtype)
    # DPT hooks at ~(0.2, 0.45, 0.7, 0.95) of depth like the reference's
    # (2,5,8,11)/12 (forcefield_sl.py:33-93) -> depth 6 uses (1, 3, 4, 5)
    dec = ForceFieldDecoder(encoder, hooks=(1, 3, 4, 5), fusion_ch=64, dtype=dtype, rngs=rngs)
    return GeometricForceFieldModule(
        dec,
        with_sl_supervision=True,
        with_mask_supervision=True,
        checkpoint_encoder=ckpt if regime == "mae" else None,
        encoder_type="mae",
        base_lr=3e-4,
        warmup_epochs=1,
        dtype=dtype,
        rngs=rngs,
    )


def evaluate(module, test: dict, out_dir: str, tag: str, batch_size: int):
    """Integrated-force metrics + field-level contact agreement + overlays."""
    import jax.numpy as jnp
    from flax import nnx

    from m3l_tpu.eval.tacbench import _bootstrap_rmse_ci, _pearson
    from m3l_tpu.tasks.forcefield_geometry import compute_sl_force

    jit_fields = nnx.jit(lambda m, a, b: m.forward_fields(a, b))
    preds_f, preds_mass, ious = [], [], []
    n = len(test["image"])
    for i in range(0, n - n % batch_size, batch_size):
        # the shear pass reads `image`, the normal (disparity) pass reads
        # `image_bg`, exactly like training (forward_fields)
        x = jnp.asarray(test["image"][i : i + batch_size])
        x_bg = jnp.asarray(test["image_bg"][i : i + batch_size])
        disp, shear = jit_fields(module, x.astype(jnp.float32) / 255.0, x_bg.astype(jnp.float32) / 255.0)
        f = np.asarray(compute_sl_force(disp[..., 0], shear))
        preds_f.append(f)
        d = np.asarray(disp[..., 0], np.float32)
        gt_mask = test["mask"][i : i + batch_size]
        # contact agreement: fraction of predicted disparity mass inside the
        # true contact region (1.0 = all predicted indentation is in-contact)
        mass = d.sum((1, 2))
        inside = (d * gt_mask).sum((1, 2))
        preds_mass.append(np.where(mass > 1e-6, inside / np.maximum(mass, 1e-6), 0.0))
        thr = d > 0.5 * d.max((1, 2), keepdims=True)
        inter = (thr & (gt_mask > 0.5)).sum((1, 2))
        union = (thr | (gt_mask > 0.5)).sum((1, 2))
        ious.append(np.where(union > 0, inter / np.maximum(union, 1), 0.0))
    pred = np.concatenate(preds_f)
    gt = test["force"][: len(pred)]
    contact = test["in_contact"][: len(pred)] > 0.5
    metrics = {}
    for j, ax in enumerate("xyz"):
        # the field is self-calibrated up to an affine scale (the SSL loss
        # never sees newtons): report Pearson r raw, RMSE after a 1-D
        # least-squares rescale (the reference's probes learn the scale)
        p, g = pred[:, j], gt[:, j]
        metrics[f"pearson_{ax}"] = round(_pearson(p, g), 4)
        a, b = np.polyfit(p, g, 1)
        err = a * p + b - g
        metrics[f"rmse_{ax}_rescaled"] = round(float(np.sqrt((err**2).mean())), 4)
        lo, hi = _bootstrap_rmse_ci(err)
        metrics[f"rmse_{ax}_ci95"] = (round(lo, 4), round(hi, 4))
    metrics["pearson_z_contact_only"] = round(_pearson(pred[contact, 2], gt[contact, 2]), 4)
    metrics["disp_mass_in_contact"] = round(float(np.concatenate(preds_mass)[contact].mean()), 4)
    metrics["contact_iou"] = round(float(np.concatenate(ious)[contact].mean()), 4)

    # quiver overlays (reference demo flow: plot_quiver_img / overlay video)
    os.makedirs(os.path.join(out_dir, tag), exist_ok=True)
    sel = np.where(contact)[0][:40]
    if len(sel):
        imgs = test["image"][sel].astype(np.float32) / 255.0
        module.render_overlay_video(imgs, os.path.join(out_dir, tag, "overlay.mp4"), spacing=12)
    return metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/forcefield")
    p.add_argument("--encoder_ckpt", default="runs/transfer/ssl_mae/last.ckpt")
    p.add_argument("--regimes", default="mae,random")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_traj_train", type=int, default=150)
    p.add_argument("--n_traj_test", type=int, default=40)
    p.add_argument("--traj_len", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--verbose", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    from m3l_tpu.data.synthetic import forcefield_windows, synth_digit_trajectories
    from m3l_tpu.train.trainer import Trainer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    os.makedirs(args.out, exist_ok=True)

    print("[ff] generating data...")
    train_raw = synth_digit_trajectories(args.n_traj_train, args.traj_len, seed=11)
    test_raw = synth_digit_trajectories(args.n_traj_test, args.traj_len, seed=12)
    train_w = forcefield_windows(train_raw)
    test_w = forcefield_windows(test_raw)
    print(f"[ff] train {len(train_w['image'])} | test {len(test_w['image'])} windows")

    all_metrics = {}
    hist_curves = {}
    for regime in args.regimes.split(","):
        rngs = nnx.Rngs(42)
        module = build_module(regime, args.encoder_ckpt, dtype, rngs)
        tr = {k: train_w[k] for k in ("image", "image_bg", "mask", "force")}
        loader = get_loader(tr, args.batch_size)
        trainer = Trainer(max_epochs=args.epochs, ckpt_dir=os.path.join(args.out, f"ff_{regime}"), save_ckpt_every_n_epochs=0, verbose=args.verbose, clip_gradients=1.0)
        t0 = time.time()
        hist = trainer.fit(module, loader)
        curve = [
            {k: round(float(v), 5) for k, v in h.items() if v is not None and (np.isscalar(v) or np.ndim(v) == 0)}
            for h in hist
        ]
        hist_curves[regime] = curve
        if curve:
            print(f"[ff] {regime} trained in {time.time() - t0:.0f}s; loss {curve[0].get('train_loss')} -> {curve[-1].get('train_loss')}")
        else:
            print(f"[ff] {regime}: no epochs ran (resumed at max_epochs? stale ckpt_dir)")
        m = evaluate(module, test_w, args.out, f"eval_{regime}", args.batch_size)
        m["train_time_s"] = round(time.time() - t0, 1)
        all_metrics[regime] = m
        print(f"[ff] {regime}: {json.dumps(m)}")

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump({"metrics": all_metrics, "loss_curves": hist_curves}, f, indent=2, default=float)

    # loss-curve plot
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        for regime, curve in hist_curves.items():
            ax.plot([c["train_loss"] for c in curve], label=regime)
        ax.set_xlabel("epoch")
        ax.set_ylabel("forcefield SSL loss")
        ax.legend()
        fig.savefig(os.path.join(args.out, "loss_curves.png"), dpi=90, bbox_inches="tight")
    except Exception as e:
        print(f"[ff] plot failed: {e}")

    rows = ["| regime | pearson fx / fy / fz | fz (contact) | disp mass in contact | contact IoU |", "|---|---|---|---|---|"]
    for regime, m in all_metrics.items():
        rows.append(
            f"| {regime} | {m['pearson_x']:.3f} / {m['pearson_y']:.3f} / {m['pearson_z']:.3f} "
            f"| {m['pearson_z_contact_only']:.3f} | {m['disp_mass_in_contact']:.3f} | {m['contact_iou']:.3f} |"
        )
    table = "\n".join(rows)
    with open(os.path.join(args.out, "RESULTS.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
