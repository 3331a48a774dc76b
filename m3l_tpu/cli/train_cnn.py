"""PPO + CNN-variant MAE (reference ``train _cnn.py`` — filename contains a
space upstream; n_envs default 1, per-sensor conv towers, posmod-free
embeddings). The upstream training path crashes on a missing attribute
(pretrain_models_cnn.py:190); this entry point runs the coherent equivalent
(models/vtmae_cnn.py docstring)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import nnx

from .train import build_parser as _base_parser


def build_parser():
    parser = _base_parser()
    parser.set_defaults(n_envs=1)
    return parser


def build_model(config, env):
    from ..models import VTT, VTTConfig
    from ..models.vtmae_cnn import VTMAECnn
    from ..rl import ActorCritic, MAEFeatures, PPOMAE

    num_tactiles = 2 if config.state_type in ("vision_and_touch", "touch") else 0
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rngs = nnx.Rngs(config.seed)
    vtt = VTT(
        VTTConfig(
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
    mae = VTMAECnn(
        vtt,
        masking_ratio=config.masking_ratio,
        decoder_dim=config.dim_embedding,
        decoder_depth=3,
        decoder_heads=4,
        use_sincosmod_encodings=config.use_sincosmod_encodings,
        dtype=dtype,
        rngs=rngs,
    )
    features = MAEFeatures(mae, config.dim_embedding, vision_only_control=config.vision_only_control, frame_stack=config.frame_stack, dtype=dtype, rngs=rngs)
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
