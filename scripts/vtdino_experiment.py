"""VTDINO to learning evidence (VERDICT r4 #6).

The reference scaffolds exactly this workflow in trainDINO.py:146-182
(commented-out VTDINO wiring): pretrain the multimodal DINO (reference
models/vtdino.py:396-442) on stored environment frames, then run PPO over
the FROZEN teacher features. This script runs it end-to-end on TPU:

1. collect N random-policy frames from FakeInsertion (dict obs: stacked
   uint8 image + float tactile);
2. pretrain VTDINOModule on them with the online reconstruction probe,
   recording the SSL + probe loss curves;
3. PPO over frozen VTDINO-teacher features at the round-2 recipe budget,
   so the curve is directly comparable to the recorded PPO+MAE run
   (BASELINE.md: success 1.00 at ~180k steps, dim 128, fs 2, 64 envs).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/vtdino_experiment.py \
      --out runs/vtdino
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def collect_frames(n_frames: int, n_envs: int, frame_stack: int, seed: int):
    from m3l_tpu.envs import SyncVecEnv, make_env

    env_fns = [make_env("FakeInsertion", i, seed, "vision_and_touch", frame_stack=frame_stack) for i in range(n_envs)]
    env = SyncVecEnv(env_fns)
    try:
        rng = np.random.default_rng(seed)
        obs = env.reset()
        images, tactiles = [], []
        steps = n_frames // n_envs
        for t in range(steps):
            images.append(np.asarray(obs["image"]))
            tactiles.append(np.asarray(obs["tactile"], np.float32))
            a = rng.uniform(-1, 1, size=(n_envs, *env.action_space.shape)).astype(np.float32)
            obs, _, _, _ = env.step(a)
        return {
            "image": np.concatenate(images, 0),  # (N, fs, 64, 64, 3) uint8
            "tactile": np.concatenate(tactiles, 0),  # (N, fs, 6, 32, 32) f32
        }
    finally:
        env.close()


def build_vtdino(dim: int, frame_stack: int, dtype, rngs):
    from m3l_tpu.models.multimodal_vtt import MultimodalVTT
    from m3l_tpu.ssl import VTDINOModule

    vtt = MultimodalVTT(
        image_size=(64, 64),
        tactile_size=(32, 32),
        image_patch_size=8,
        tactile_patch_size=4,
        dim=dim,
        depth=4,
        heads=4,
        mlp_dim=dim * 2,
        num_tactiles=2,
        frame_stack=frame_stack,
        num_register_tokens=1,
        dtype=dtype,
        rngs=rngs,
    )

    import jax
    from m3l_tpu.utils.obs import vt_load

    class VTDINOOnObs(VTDINOModule):
        """VTDINO fed raw env obs batches: vt_load packs {image uint8,
        tactile} -> {image, tactile1, tactile2} INSIDE the jitted step
        (uint8 ships over the relay link, 4x less transfer)."""

        def training_loss(self, batch, key, step):
            x = vt_load({k: batch[k] for k in ("image", "tactile")}, frame_stack=frame_stack)
            return super().training_loss(x, key, step)

    return VTDINOOnObs(
        vtt,
        dino_out_dim=4096,
        dino_hidden_dim=1024,
        dino_bottleneck_dim=128,
        num_global_masks=1,
        num_local_masks=4,
        moving_average_decay=(0.99, 0.999),
        teacher_warmup_epochs=2,
        warmup_epochs=2,
        base_lr=5e-4,
        with_reconstruction_probe=True,
        dtype=dtype,
        rngs=rngs,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/vtdino")
    p.add_argument("--n_frames", type=int, default=20480)
    p.add_argument("--epochs_ssl", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--frame_stack", type=int, default=2)
    p.add_argument("--n_envs", type=int, default=64)
    p.add_argument("--rollout_length", type=int, default=8192)
    p.add_argument("--total_timesteps", type=int, default=200_000)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--skip_ppo", action="store_true")
    p.add_argument("--verbose", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from m3l_tpu.data.datasets import ArrayDataset, DataLoader
    from m3l_tpu.train.trainer import Trainer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    os.makedirs(args.out, exist_ok=True)

    # ---- 1. collect -------------------------------------------------- #
    print(f"[vtdino] collecting {args.n_frames} frames...")
    t0 = time.time()
    frames = collect_frames(args.n_frames, args.n_envs, args.frame_stack, seed=0)
    print(f"[vtdino] collected in {time.time() - t0:.0f}s: image {frames['image'].shape} tactile {frames['tactile'].shape}")

    # ---- 2. pretrain -------------------------------------------------- #
    rngs = nnx.Rngs(0)
    module = build_vtdino(args.dim, args.frame_stack, dtype, rngs)
    loader = DataLoader(ArrayDataset(frames), batch_size=args.batch_size, shuffle=True, seed=0, drop_last=True)
    ckpt_dir = os.path.join(args.out, "ssl_vtdino")
    trainer = Trainer(max_epochs=args.epochs_ssl, ckpt_dir=ckpt_dir, save_ckpt_every_n_epochs=0, verbose=args.verbose, clip_gradients=1.0)
    t0 = time.time()
    hist = trainer.fit(module, loader)
    curve = [{k: round(float(v), 5) for k, v in h.items() if v is not None and np.ndim(v) == 0} for h in hist]
    with open(os.path.join(args.out, "ssl_curve.json"), "w") as f:
        json.dump(curve, f, indent=2)
    if curve:
        print(
            f"[vtdino] pretrain {time.time() - t0:.0f}s: ssl_loss {curve[0].get('train_ssl_loss', curve[0].get('train_loss'))} -> "
            f"{curve[-1].get('train_ssl_loss', curve[-1].get('train_loss'))}, recon {curve[0].get('train_reconstruction_loss')} -> {curve[-1].get('train_reconstruction_loss')}"
        )
    if args.skip_ppo:
        return

    # ---- 3. frozen-feature PPO ---------------------------------------- #
    from m3l_tpu.envs import SyncVecEnv, make_env
    from m3l_tpu.nn.transformer import Transformer
    from m3l_tpu.rl import ActorCritic, PPOMAE
    from m3l_tpu.utils.obs import vt_load

    class FrozenVTDINOFeatures(nnx.Module):
        """Frozen VTDINO-teacher features for PPO (the reference's scaffolded
        DINOPolicy-over-VTDINO, trainDINO.py:146-182 + pretrain_policy.py):
        teacher forward (register ++ patch tokens) -> stop_gradient ->
        depth-1 transformer -> mean-pool (MAEExtractor shape, so the PPO
        stack is identical to the MAE baseline's)."""

        def __init__(self, teacher, dim, frame_stack, dtype, rngs):
            self.teacher = teacher
            self.frame_stack = frame_stack
            self.post = Transformer(dim, depth=1, heads=4, dim_head=64, mlp_dim=dim * 2, dtype=dtype, rngs=rngs)

        def from_packed(self, x: dict) -> jnp.ndarray:
            out = self.teacher.forward_features({k: v for k, v in x.items() if k == "image" or k.startswith("tactile")})
            toks = jnp.concatenate([out["x_norm_regtokens"], out["x_norm_patchtokens"]], axis=1)
            toks = jax.lax.stop_gradient(toks)  # frozen teacher
            return jnp.mean(self.post(toks), axis=1)

        def __call__(self, obs: dict) -> jnp.ndarray:
            return self.from_packed(vt_load(obs, frame_stack=self.frame_stack))

    feats = FrozenVTDINOFeatures(module.teacher_backbone, args.dim, args.frame_stack, dtype, nnx.Rngs(1))
    env_fns = [make_env("FakeInsertion", i, 1, "vision_and_touch", frame_stack=args.frame_stack) for i in range(args.n_envs)]
    env = SyncVecEnv(env_fns)
    try:
        policy = ActorCritic(feats, args.dim, env.action_space.shape[0], dtype=dtype, rngs=nnx.Rngs(2))
        model = PPOMAE(
            policy,
            env,
            learning_rate=3e-4,
            n_steps=args.rollout_length // args.n_envs,
            batch_size=512,
            n_epochs=10,
            train_mae=False,
            frame_stack=args.frame_stack,
            seed=1,
            verbose=1,
        )
        rl_curve = []

        def cb(m):
            ep = m.ep_info_buffer
            if ep:
                rl_curve.append(
                    {
                        "steps": int(m.num_timesteps),
                        "ep_rew_mean": round(float(np.mean([e["r"] for e in ep])), 2),
                        "success_rate": round(float(np.mean([e.get("s", 0.0) for e in ep])), 3),
                    }
                )
            return True

        model.learn(total_timesteps=args.total_timesteps, callback=cb)
        with open(os.path.join(args.out, "ppo_frozen_curve.json"), "w") as f:
            json.dump(rl_curve, f, indent=2)
        print(f"[vtdino] frozen-feature PPO final: {rl_curve[-1] if rl_curve else 'n/a'}")
    finally:
        env.close()


if __name__ == "__main__":
    main()
