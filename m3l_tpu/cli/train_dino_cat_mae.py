"""PPO + (MAE ⊕ frozen-DINO) fused features (reference train_dino_cat_mae.py).

Reference defaults: VTT 70x70 / patch 14, dim 384, mask ratio 0.8, frozen
DINOv2 features of the middle stacked frame concatenated to the MAE features
and fused by a 3-layer MLP. The reference file's import is broken upstream
(train_dino_cat_mae.py:5 imports a module whose filename has a trailing
underscore — SURVEY.md quirks list); this entry point is the working
equivalent. ``--tactile_only_mae`` switches to the train_dino_tac_mae.py
variant (MAE reconstructs tactile only).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import nnx

from .train import build_parser as _base_parser, str2bool


def build_parser():
    parser = _base_parser()
    # early-conv token grids don't align with the 70/14 patch grid, so the
    # patch-embedding path is the coherent default for this variant
    parser.set_defaults(dim_embedding=384, masking_ratio=0.8, early_conv_masking=False)
    parser.add_argument("--dinov2_weights", type=str, default=None)
    parser.add_argument("--tactile_only_mae", type=str2bool, default=False)
    return parser


def build_model(config, env):
    from ..models import VTT, VTTConfig, VTMAE
    from ..models.dinov2_interop import dinov2_vits14, load_torch_dinov2_state
    from ..rl import ActorCritic, PPOMAE
    from ..rl.dino_fusion_features import DinoCatMAEFeatures

    num_tactiles = 2 if config.state_type in ("vision_and_touch", "touch") else 0
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rngs = nnx.Rngs(config.seed)
    # reference train_dino_cat_mae.py:139-152: VTT 70x70 image+tactile, patch 14
    vtt = VTT(
        VTTConfig(
            image_size=(70, 70),
            tactile_size=(70, 70),
            image_patch_size=14,
            tactile_patch_size=14,
            dim=config.dim_embedding,
            depth=4,
            heads=4,
            mlp_dim=config.dim_embedding * 2,
            num_tactiles=num_tactiles,
            frame_stack=config.frame_stack,
        ),
        dtype=dtype,
        rngs=rngs,
    )
    mae = VTMAE(
        vtt,
        masking_ratio=config.masking_ratio,
        decoder_dim=config.dim_embedding,
        decoder_depth=3,
        decoder_heads=4,
        early_conv_masking=config.early_conv_masking,
        use_sincosmod_encodings=config.use_sincosmod_encodings,
        dtype=dtype,
        rngs=rngs,
    )
    dino = dinov2_vits14(num_register_tokens=4, img_size=(70, 70), dtype=dtype, rngs=rngs)
    if config.dinov2_weights:
        import torch

        sd = torch.load(config.dinov2_weights, map_location="cpu")
        load_torch_dinov2_state(dino, sd.get("model", sd.get("state_dict", sd)))
    features = DinoCatMAEFeatures(
        mae,
        dino,
        config.dim_embedding,
        vision_only_control=config.vision_only_control,
        tactile_only_mae=config.tactile_only_mae,
        frame_stack=config.frame_stack,
        dtype=dtype,
        rngs=rngs,
    )
    policy = ActorCritic(features, config.dim_embedding, env.action_space.shape[0], dtype=dtype, rngs=rngs)
    return PPOMAE(
        policy,
        env,
        learning_rate=config.lr_ppo,
        n_steps=config.rollout_length // config.n_envs,
        batch_size=config.batch_size,
        n_epochs=config.ppo_epochs,
        mae_batch_size=config.mae_batch_size,
        separate_optimizer=config.separate_optimizer,
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
        make_env(config.env, i, config.seed, config.state_type, camera_idx=config.camera_idx, frame_stack=config.frame_stack, no_rotation=config.no_rotation, use_latch=config.use_latch, image_size=70, tactile_size=70, allow_fake=config.allow_fake)
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
