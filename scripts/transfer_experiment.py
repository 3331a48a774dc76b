"""SSL -> probe transfer experiment (VERDICT r2 item #2).

Reproduces the reference's tactile_ssl workflow end-to-end on synthetic
DIGIT-style data (reference tactile_ssl/downstream_task/sl_module.py:18-148 +
test/test_t1_force.py:66-122): pretrain an encoder with MAE (and optionally
DINO), then train T1-force and T2-slip probes in three regimes —
pretrained-frozen, random-frozen, end-to-end — and evaluate through the
TacBench harness (bootstrap CI95, Pearson r, balanced accuracy) with plots.

The claim under test: pretrained-frozen > random-frozen (and ~ e2e), i.e.
the SSL representation carries the task information.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/transfer_experiment.py \
      --out runs/transfer --algos mae,dino --epochs_ssl 30 --epochs_probe 10
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def get_loader(split: dict, batch_size: int, shuffle=True, seed=0, drop_last=True):
    # images stay uint8 through the host->device link (4x less transfer over
    # the relay, ~88 MB/s); modules dequantize on device (ssl.module.as_float_image)
    from m3l_tpu.data.datasets import ArrayDataset, DataLoader

    return DataLoader(ArrayDataset(split), batch_size=batch_size, shuffle=shuffle, seed=seed, drop_last=drop_last)


def build_encoder(rngs, dtype):
    from m3l_tpu.models.vit import VisionTransformer

    return VisionTransformer(
        img_size=(96, 96),
        patch_size=16,
        in_chans=6,
        embed_dim=192,
        depth=6,
        num_heads=3,
        pos_embed_fn="sinusoidal",
        num_register_tokens=1,
        dtype=dtype,
        rngs=rngs,
    )


def build_video_encoder(rngs, dtype):
    """2-frame tubelet encoder for the V-JEPA arm (reference
    tactile_ssl/algorithm/vjepa.py consumes b c t h w video; here the same
    96x96 windows as the other arms, kept as 2 frames instead of channel-
    concatenated). grid = (1, 6, 6) -> 36 tokens, matching the image arms."""
    from m3l_tpu.models.vit import VisionTransformer

    return VisionTransformer(
        img_size=(96, 96),
        patch_size=16,
        in_chans=3,
        num_frames=2,
        tubelet_size=2,
        embed_dim=192,
        depth=6,
        num_heads=3,
        pos_embed_fn="sinusoidal",
        dtype=dtype,
        rngs=rngs,
    )


def as_video(windows):
    """concat_ch windows (M, H, W, 2*C) -> (M, 2, H, W, C) video; the window
    channels are [frame0 RGB, frame1 RGB] (windowed_probe_samples order)."""
    m, h, w, c = windows.shape
    return windows.reshape(m, h, w, 2, c // 2).transpose(0, 3, 1, 2, 4)


def pretrain(algo: str, ssl_frames: dict, out_dir: str, epochs: int, batch_size: int, dtype, verbose: int):
    """Pretrain `algo` on SSL windows; returns checkpoint path."""
    import jax.numpy as jnp
    from flax import nnx

    from m3l_tpu.train.trainer import Trainer

    ckpt_dir = os.path.join(out_dir, f"ssl_{algo}")
    ckpt = os.path.join(ckpt_dir, "last.ckpt")
    if os.path.exists(ckpt):
        # Reuse ONLY a checkpoint that finished its schedule. A preempted run
        # (SIGTERM -> Trainer checkpoints and RETURNS) leaves a partial
        # last.ckpt that a blind reuse would silently treat as pretrained —
        # exactly how round 4's interrupted replication (epoch 8/45) clobbered
        # the mae arm (0.785 -> 0.180). Resume-to-completion instead.
        from m3l_tpu.train.checkpoint import load_checkpoint

        done_epochs = int(load_checkpoint(ckpt).get("current_epoch", 0))
        if done_epochs >= epochs:
            print(f"[transfer] reusing {ckpt} ({done_epochs} epochs)")
            return ckpt
        print(f"[transfer] {ckpt} is partial ({done_epochs}/{epochs} epochs); resuming")
    rngs = nnx.Rngs(0)
    encoder = build_encoder(rngs, dtype)
    if algo == "mae":
        from m3l_tpu.ssl.mae import MAEModule

        module = MAEModule(
            encoder,
            decoder_embed_dim=192,
            decoder_depth=4,
            decoder_num_heads=6,
            mask_ratio=0.75,
            base_lr=1.5e-3,
            warmup_epochs=2,
            dtype=dtype,
            rngs=rngs,
        )
    elif algo == "dino":
        from m3l_tpu.ssl.dino import DINOModule

        module = DINOModule(
            encoder,
            dino_out_dim=4096,
            dino_hidden_dim=1024,
            dino_bottleneck_dim=128,
            base_lr=5e-4,
            warmup_epochs=2,
            teacher_warmup_epochs=2,
            with_reconstruction_probe=False,
            dtype=dtype,
            rngs=rngs,
        )
    elif algo == "dinov2":
        # DINOv2 = DINO CLS loss + iBOT patch loss + KoLeo (reference
        # tactile_ssl/algorithm/dinov2.py). The iBOT masked-patch objective
        # trains the PATCH tokens directly (unlike DINO-v1, whose patch
        # tokens are a byproduct of the CLS path) — the hypothesis under
        # test for the texture probe (VERDICT r3 #4: "DINO/DINOv2").
        from m3l_tpu.ssl.dinov2 import DINOv2Module

        module = DINOv2Module(
            encoder,
            dino_out_dim=4096,
            dino_hidden_dim=1024,
            dino_bottleneck_dim=128,
            num_global_masks=2,
            num_local_masks=4,
            koleo_weight=0.1,
            centering="centering",
            base_lr=5e-4,
            warmup_epochs=2,
            teacher_warmup_epochs=2,
            with_reconstruction_probe=False,
            dtype=dtype,
            rngs=rngs,
        )
    elif algo == "ijepa":
        # I-JEPA latent-prediction (reference tactile_ssl/algorithm/ijepa.py):
        # like iBOT, a dense patch-level objective — second arm of the
        # CLS-objective-vs-patch-objective transfer comparison.
        from m3l_tpu.ssl.ijepa import IJEPAModule
        from m3l_tpu.train.builders import build_predictor

        predictor = build_predictor(encoder, embed_dim=96, depth=4, num_heads=3, num_mask_tokens=4, seed=7)
        module = IJEPAModule(
            encoder,
            predictor,
            num_target_masks=4,
            moving_average_decay=(0.996, 1.0),
            base_lr=1e-3,
            warmup_epochs=2,
            rngs=rngs,
        )
    elif algo == "vjepa":
        # V-JEPA latent prediction on 2-frame tactile "video" with tube masks
        # (reference tactile_ssl/algorithm/vjepa.py:348-377; VERDICT r4 #2 —
        # the one SSL family without end-to-end evidence).
        from m3l_tpu.ssl.vjepa import VJEPAModule
        from m3l_tpu.train.builders import build_predictor

        encoder = build_video_encoder(rngs, dtype)
        predictor = build_predictor(encoder, embed_dim=96, depth=4, num_heads=3, num_mask_tokens=1, seed=7)
        module = VJEPAModule(
            encoder,
            predictor,
            mask_ratio=0.75,
            num_masks=1,
            moving_average_decay=(0.998, 1.0),
            base_lr=1e-3,
            warmup_epochs=2,
            rngs=rngs,
        )
        ssl_frames = {"image": as_video(ssl_frames["image"])}
    else:
        raise ValueError(algo)
    loader = get_loader(ssl_frames, batch_size)
    trainer = Trainer(max_epochs=epochs, ckpt_dir=ckpt_dir, save_ckpt_every_n_epochs=0, verbose=verbose, clip_gradients=1.0)
    t0 = time.time()
    trainer.fit(module, loader)
    print(f"[transfer] {algo} pretrain done in {time.time() - t0:.0f}s -> {ckpt}")
    return ckpt


def train_probe(task: str, regime: str, ckpt: str | None, encoder_type: str, splits, epochs, batch_size, dtype, verbose, video: bool = False):
    """Train a T1/T2 probe in the given regime; returns (module, metrics)."""
    import jax.numpy as jnp
    from flax import nnx

    from m3l_tpu.tasks.modules import ForceSLModule, SlipSLModule
    from m3l_tpu.tasks.probes import ForceLinearProbe, SlipProbe
    from m3l_tpu.tasks.sl_module import EncoderWrapper
    from m3l_tpu.train.trainer import Trainer

    class VideoEncoderWrapper(EncoderWrapper):
        """Feeds the probes' concat_ch windows to a tubelet (video) encoder:
        (B, H, W, 2*C) -> (B, 2, H, W, C). Keeps the probe/eval pipeline
        identical across arms; checkpoint surgery still targets .encoder."""

        def __call__(self, x):
            return self.encoder.forward_features(as_video(x))["x_norm_patchtokens"]

    train, test = splits
    rngs = nnx.Rngs(42)
    encoder = VideoEncoderWrapper(build_video_encoder(rngs, dtype)) if video else build_encoder(rngs, dtype)
    kwargs = dict(
        checkpoint_encoder=ckpt if regime == "pretrained" else None,
        encoder_type=encoder_type,
        train_encoder=regime == "e2e",
        base_lr=1e-3 if regime != "e2e" else 3e-4,
        warmup_epochs=1,
    )
    if task == "force":
        probe = ForceLinearProbe(192, num_heads=3, dtype=dtype, rngs=rngs)
        module = ForceSLModule(encoder, probe, **kwargs)
        keys = {"image", "force"}
    elif task == "texture":
        # T6-textile analogue: per-trajectory texture class — a GLOBAL,
        # invariance-friendly label where the DINO objective should shine
        # (reference downstream_task/textile_sl.py:73-209; VERDICT r3 #4)
        from m3l_tpu.tasks.modules import TextileSLModule
        from m3l_tpu.tasks.probes import TextileLinearProbe

        n_classes = int(train["textile"].max()) + 1
        probe = TextileLinearProbe(192, num_classes=n_classes, num_heads=3, dtype=dtype, rngs=rngs)
        module = TextileSLModule(encoder, probe, **kwargs)
        keys = {"image", "textile"}
    elif task == "pose":
        # T3 pose analogue: contact-blob position bins + shear-direction bin
        # (reference downstream_task/pose_sl.py:100-304; VERDICT r4 #5)
        from m3l_tpu.tasks.modules import PoseSLModule
        from m3l_tpu.tasks.probes import PoseLinearProbe

        probe = PoseLinearProbe(192, num_classes=10, num_heads=3, dtype=dtype, rngs=rngs)
        module = PoseSLModule(encoder, probe, **kwargs)
        keys = {"image", "pose_x", "pose_y", "pose_theta"}
    elif task == "grasp":
        # T4 grasp stability: firm non-slipping contact (reference
        # downstream_task/grasp_sl.py:66-178; VERDICT r4 #5)
        from m3l_tpu.tasks.modules import GraspSLModule
        from m3l_tpu.tasks.probes import GraspLinearProbe

        n1 = float(train["grasp"].mean())
        probe = GraspLinearProbe(192, num_classes=2, num_heads=3, dtype=dtype, rngs=rngs)
        module = GraspSLModule(encoder, probe, class_weights=[1.0 / max(1 - n1, 1e-3), 1.0 / max(n1, 1e-3)], **kwargs)
        keys = {"image", "grasp"}
    else:
        n1 = float(train["slip"].mean())
        probe = SlipProbe(192, num_classes=2, num_heads=3, dtype=dtype, rngs=rngs)
        module = SlipSLModule(encoder, probe, class_weights=[1.0 / max(1 - n1, 1e-3), 1.0 / max(n1, 1e-3)], **kwargs)
        keys = {"image", "slip"}
    tr = {k: v for k, v in train.items() if k in keys}
    loader = get_loader(tr, batch_size)
    trainer = Trainer(max_epochs=epochs, verbose=verbose, clip_gradients=1.0)
    trainer.fit(module, loader)
    return module


def evaluate_probe(task, module, test, out_dir, tag, batch_size):
    from m3l_tpu.eval.tacbench import TestForceSL, TestGraspSL, TestPoseSL, TestSlipSL, TestTextileSL

    keys = {
        "force": {"image", "force"},
        "slip": {"image", "slip"},
        "texture": {"image", "textile"},
        "pose": {"image", "pose_x", "pose_y", "pose_theta"},
        "grasp": {"image", "grasp"},
    }[task]
    te = {k: v for k, v in test.items() if k in keys}
    # drop_last=False: eval must cover the WHOLE test set (the tail batch is
    # one extra compile at the remainder shape — fine for a one-shot eval)
    loader = get_loader(te, batch_size, shuffle=False, drop_last=False)
    cache = os.path.join(out_dir, "eval", tag)
    tester_cls = {"force": TestForceSL, "slip": TestSlipSL, "texture": TestTextileSL, "pose": TestPoseSL, "grasp": TestGraspSL}[task]
    tester = tester_cls(module, cache_dir=cache)
    results = tester.run_model(loader)
    metrics = tester.get_overall_metrics(results)
    try:
        plots = tester.make_plots(results) if hasattr(tester, "make_plots") else {}
        for name, img in (plots or {}).items():
            out = os.path.join(cache, f"{name.replace('/', '_')}.png")
            if hasattr(img, "savefig"):
                img.savefig(out, dpi=80)
            else:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.imsave(out, np.asarray(img))
    except Exception as e:  # plots are best-effort
        print(f"[transfer] plots failed for {tag}: {e}")
    return metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/transfer")
    p.add_argument("--algos", default="mae")
    p.add_argument("--tasks", default="force,slip", help="comma list of force,slip,texture")
    p.add_argument("--textures", type=int, default=0, help="texture classes woven into the synthetic gel (0 = off; required for the texture task)")
    p.add_argument("--regimes", default="pretrained,random,e2e")
    p.add_argument("--epochs_ssl", type=int, default=30)
    p.add_argument("--epochs_probe", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--n_traj_ssl", type=int, default=400)
    p.add_argument("--n_traj_probe", type=int, default=150)
    p.add_argument("--n_traj_test", type=int, default=60)
    p.add_argument("--traj_len", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--verbose", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp

    from m3l_tpu.data.synthetic import synth_digit_trajectories, windowed_probe_samples

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    os.makedirs(args.out, exist_ok=True)

    print("[transfer] generating data...")
    tex = args.textures or None
    if "texture" in args.tasks and not tex:
        raise SystemExit("--tasks texture requires --textures K (e.g. 6)")
    ssl_raw = synth_digit_trajectories(args.n_traj_ssl, args.traj_len, seed=1, textures=tex)
    probe_raw = synth_digit_trajectories(args.n_traj_probe, args.traj_len, seed=2, textures=tex)
    test_raw = synth_digit_trajectories(args.n_traj_test, args.traj_len, seed=3, textures=tex)
    ssl_w = windowed_probe_samples(ssl_raw, 2)
    train_w = windowed_probe_samples(probe_raw, 2)
    test_w = windowed_probe_samples(test_raw, 2)
    print(f"[transfer] ssl {len(ssl_w['image'])} | probe-train {len(train_w['image'])} | test {len(test_w['image'])}")

    def contact_only(w):
        m = w["in_contact"] > 0.5
        return {k: v[m] for k, v in w.items()}

    all_metrics = {}
    for algo in args.algos.split(","):
        ckpt = pretrain(algo, {"image": ssl_w["image"]}, args.out, args.epochs_ssl, args.batch_size, dtype, args.verbose)
        enc_type = "dino" if "dino" in algo else ("jepa" if "jepa" in algo else "mae")
        for task in args.tasks.split(","):
            # pose is only defined in contact (the blob is the pose cue)
            tr_w, te_w = (contact_only(train_w), contact_only(test_w)) if task == "pose" else (train_w, test_w)
            for regime in args.regimes.split(","):
                if regime != "pretrained" and f"{task}/{regime}" in all_metrics:
                    continue  # random/e2e are algo-independent
                tag = f"{task}/{regime}" if regime != "pretrained" else f"{task}/{algo}-frozen"
                t0 = time.time()
                module = train_probe(
                    task, regime, ckpt, enc_type, (tr_w, te_w), args.epochs_probe,
                    args.batch_size, dtype, args.verbose, video=(algo == "vjepa" and regime == "pretrained"),
                )
                m = evaluate_probe(task, module, te_w, args.out, tag.replace("/", "_"), args.batch_size)
                m["train_time_s"] = round(time.time() - t0, 1)
                all_metrics[tag] = m
                print(f"[transfer] {tag}: " + json.dumps(m))

    # merge with any prior arms in the same out dir (new tags win) so
    # incremental runs extend the table instead of clobbering it
    mpath = os.path.join(args.out, "metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            prior = json.load(f)
        prior.update(all_metrics)
        all_metrics = prior
    with open(mpath, "w") as f:
        json.dump(all_metrics, f, indent=2, default=float)

    # markdown table
    lines = ["| task | regime | key metrics |", "|---|---|---|"]
    for tag, m in all_metrics.items():
        task, regime = tag.split("/")
        if task == "force":
            pearson = np.mean([m.get(f"pearson_{a}", float("nan")) for a in "xyz"])
            ci = m.get("rmse_z_ci95", (float("nan"), float("nan")))
            key = f"RMSE {m.get('rmse', float('nan')):.4f} (z CI95 {ci[0]:.4f}-{ci[1]:.4f}), mean Pearson {pearson:.3f}"
        elif task == "texture":
            key = f"acc {m.get('accuracy', float('nan')):.3f}, balanced {m.get('balanced_accuracy', float('nan')):.3f}"
        elif task == "pose":
            key = ", ".join(f"acc_{h} {m.get(f'acc_{h}', float('nan')):.3f}" for h in ("x", "y", "theta"))
        elif task == "grasp":
            key = f"acc {m.get('accuracy', float('nan')):.3f}, balanced {m.get('balanced_accuracy', float('nan')):.3f}"
        else:
            f1 = m.get("f1", [float("nan")] * 2)
            key = f"acc {m.get('accuracy', float('nan')):.3f}, balanced {m.get('balanced_accuracy', float('nan')):.3f}, slip-f1 {f1[-1]:.3f}"
        lines.append(f"| {task} | {regime} | {key} |")
    table = "\n".join(lines)
    with open(os.path.join(args.out, "RESULTS.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
