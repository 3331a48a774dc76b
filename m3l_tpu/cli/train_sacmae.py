"""SAC+MAE training entry point — flag-compatible with the reference CLI
(reference Train_sacmae.py:36-121)."""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np
from flax import nnx

from .train import build_mesh, str2bool


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("M3L-TPU-SAC")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save_freq", type=int, default=int(1e5))
    parser.add_argument("--eval_every", type=int, default=int(2e5))
    parser.add_argument("--total_timesteps", type=int, default=int(3e6))
    parser.add_argument("--wandb_dir", type=str, default="./wandb/")
    parser.add_argument("--wandb_id", type=str, default=None)
    parser.add_argument("--wandb_entity", type=str, default=None)
    parser.add_argument(
        "--env",
        type=str,
        default="tactile_envs/Insertion-v0",
        help=(
            "tactile_envs/Insertion-v0 | Door | HandManipulate*-v1 | "
            "FakeInsertion | MuJoCoPixels/<any gymnasium MuJoCo id>"
        ),
    )
    parser.add_argument("--n_envs", type=int, default=1)  # reference: SAC is single-env by default
    parser.add_argument("--state_type", type=str, default="vision_and_touch", choices=["vision", "touch", "vision_and_touch"])
    parser.add_argument("--norm_reward", type=str2bool, default=True)
    parser.add_argument("--use_latch", type=str2bool, default=True)
    parser.add_argument("--camera_idx", type=int, default=0, choices=[0, 1, 2, 3])
    parser.add_argument("--frame_stack", type=int, default=4)
    parser.add_argument("--no_rotation", type=str2bool, default=True)
    # MAE
    parser.add_argument("--representation", type=str2bool, default=True)
    parser.add_argument("--early_conv_masking", type=str2bool, default=True)
    parser.add_argument("--dim_embedding", type=int, default=256)
    parser.add_argument("--use_sincosmod_encodings", type=str2bool, default=True)
    parser.add_argument("--masking_ratio", type=float, default=0.95)
    parser.add_argument("--mae_batch_size", type=int, default=256)
    parser.add_argument("--train_mae_every", type=int, default=1)
    # SAC
    parser.add_argument("--learning_rate", type=float, default=3e-4)
    parser.add_argument("--buffer_size", type=int, default=1000000)
    parser.add_argument("--learning_starts", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--tau", type=float, default=0.005)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--train_freq", type=int, default=1)
    parser.add_argument("--gradient_steps", type=int, default=1)
    parser.add_argument("--ent_coef", type=str, default="auto")
    parser.add_argument("--target_update_interval", type=int, default=1)
    parser.add_argument("--target_entropy", type=str, default="auto")
    parser.add_argument("--vision_only_control", type=str2bool, default=False)
    # SAC-MAE
    parser.add_argument("--separate_optimizer", type=str2bool, default=True)
    # TPU-specific
    parser.add_argument("--allow_fake", type=str2bool, default=False)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    parser.add_argument("--device_buffer", type=str2bool, default=False, help="keep the replay ring in device HBM (no per-gradient-step host->device batch copy)")
    parser.add_argument("--timeout_capacity", type=int, default=4096, help="device-buffer truncated-episode side-ring slots; raise for large rings with short episodes")
    parser.add_argument("--subproc", type=str2bool, default=True)
    parser.add_argument(
        "--mesh_devices", type=int, default=1,
        help="shard training over an N-device GSPMD mesh (the reference's Fabric devices=N DDP launch); 0 = all visible devices, 1 = single-chip",
    )
    parser.add_argument(
        "--mesh_mp", type=int, default=1,
        help="Megatron-style tensor-parallel degree within the mesh (mesh = dp x mp)",
    )
    parser.add_argument("--verbose", type=int, default=1)
    parser.add_argument("--tensorboard_dir", type=str, default=None, help="enable TensorBoard logging")
    return parser


def build_model(config, env):
    from ..models import VTT, VTTConfig, VTMAE
    from ..rl import MAEFeatures, SACActorCritic, SACMAE

    num_tactiles = 0
    if config.state_type in ("vision_and_touch", "touch"):
        num_tactiles = 2
        if config.env.startswith(("HandManipulate", "MuJoCoPixels/")):
            num_tactiles = 1

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
    features = MAEFeatures(
        mae, config.dim_embedding, vision_only_control=config.vision_only_control, frame_stack=config.frame_stack, dtype=dtype, rngs=rngs
    )
    policy = SACActorCritic(features, config.dim_embedding, env.action_space.shape[0], dtype=dtype, rngs=rngs)
    try:
        ent_coef = float(config.ent_coef)
    except (TypeError, ValueError):
        ent_coef = config.ent_coef
    return SACMAE(
        policy,
        env,
        learning_rate=config.learning_rate,
        buffer_size=config.buffer_size,
        learning_starts=config.learning_starts,
        batch_size=config.batch_size,
        tau=config.tau,
        gamma=config.gamma,
        train_freq=config.train_freq,
        gradient_steps=config.gradient_steps,
        ent_coef=ent_coef,
        target_update_interval=config.target_update_interval,
        target_entropy=config.target_entropy if config.target_entropy == "auto" else float(config.target_entropy),
        mae_batch_size=config.mae_batch_size,
        separate_optimizer=config.separate_optimizer,
        norm_reward=config.norm_reward,
        device_buffer=config.device_buffer,
        timeout_capacity=config.timeout_capacity,
        frame_stack=config.frame_stack,
        mesh=build_mesh(config),
        seed=config.seed,
        verbose=config.verbose,
    )


def main(argv=None):
    from ..envs import make_env, make_vec_env

    config = build_parser().parse_args(argv)
    np.random.seed(config.seed)
    objects = ["square", "triangle", "horizontal", "vertical", "trapezoidal", "rhombus"]
    holders = ["holder1", "holder2", "holder3"]
    env_fns = [
        make_env(
            config.env,
            i,
            config.seed,
            config.state_type,
            objects=objects,
            holders=holders,
            camera_idx=config.camera_idx,
            frame_stack=config.frame_stack,
            no_rotation=config.no_rotation,
            use_latch=config.use_latch,
            allow_fake=config.allow_fake,
        )
        for i in range(config.n_envs)
    ]
    env = make_vec_env(env_fns, subproc=config.subproc)
    model = build_model(config, env)
    try:
        callback = None
        if config.tensorboard_dir:
            from ..rl.callbacks import CallbackList, CheckpointCallback, TensorboardCallback
            from ..utils.loggers import TensorBoardLogger

            logger = TensorBoardLogger(config.tensorboard_dir)
            callback = CallbackList([
                TensorboardCallback(logger),
                CheckpointCallback(config.save_freq, config.tensorboard_dir + "/checkpoints", save_replay_buffer=True),
            ])
        model.learn(total_timesteps=config.total_timesteps, callback=callback)
    finally:
        env.close()
    return model


if __name__ == "__main__":
    main()
