"""PPO over frozen-DINOv2 features (reference trainDINO.py:25-215).

Reference defaults: n_envs 64, frame_stack 1, dim 384, the hub
``dinov2_vits14_reg`` frozen (:142-144), plain PPO (the DINO self-
distillation updates are scaffolded-but-disabled upstream,
models/ppo_dino.py:276-440). Weights load from ``--dinov2_weights`` (a local
torch .pth) when given; otherwise the backbone is randomly initialized
(zero-egress: hub download is impossible here).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import nnx

from .train import build_parser as _base_parser


def build_parser():
    parser = _base_parser()
    parser.set_defaults(n_envs=64, frame_stack=1, dim_embedding=384, rollout_length=32768)
    parser.add_argument("--dinov2_weights", type=str, default=None, help="local torch .pth with DINOv2 ViT-S/14 weights")
    return parser


def build_model(config, env):
    from ..models.dinov2_interop import dinov2_vits14, load_torch_dinov2_state
    from ..rl import ActorCritic, PPOMAE
    from ..rl.frozen_features import FrozenEncoderFeatures

    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rngs = nnx.Rngs(config.seed)
    dino = dinov2_vits14(num_register_tokens=4, img_size=(70, 70), dtype=dtype, rngs=rngs)
    if config.dinov2_weights:
        import torch

        sd = torch.load(config.dinov2_weights, map_location="cpu")
        sd = sd.get("model", sd.get("state_dict", sd))
        n = load_torch_dinov2_state(dino, sd)
        print(f"[traindino] loaded {n:,} params from {config.dinov2_weights}")
    else:
        print("[traindino] WARNING: no --dinov2_weights given; frozen encoder is randomly initialized")

    features = FrozenEncoderFeatures(dino, config.dim_embedding, frame_stack=config.frame_stack, crop_size=70, dtype=dtype, rngs=rngs)
    policy = ActorCritic(features, config.dim_embedding, env.action_space.shape[0], dtype=dtype, rngs=rngs)
    return PPOMAE(
        policy,
        env,
        learning_rate=config.lr_ppo,
        n_steps=config.rollout_length // config.n_envs,
        batch_size=config.batch_size,
        n_epochs=config.ppo_epochs,
        train_mae=False,
        norm_reward=config.norm_reward,
        frame_stack=config.frame_stack,
        seed=config.seed,
        verbose=config.verbose,
    )


def main(argv=None):
    from ..envs import make_env, make_vec_env

    config = build_parser().parse_args(argv)
    np.random.seed(config.seed)
    env_fns = [
        make_env(config.env, i, config.seed, config.state_type, camera_idx=config.camera_idx, frame_stack=config.frame_stack, no_rotation=config.no_rotation, use_latch=config.use_latch, allow_fake=config.allow_fake)
        for i in range(config.n_envs)
    ]
    env = make_vec_env(env_fns, subproc=config.subproc)
    model = build_model(config, env)
    try:
        model.learn(total_timesteps=config.total_timesteps)
    finally:
        env.close()
    return model


if __name__ == "__main__":
    main()
