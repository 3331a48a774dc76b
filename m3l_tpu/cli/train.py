"""PPO+MAE training entry point — flag-compatible with the reference CLI
(reference train.py:25-81), plus TPU-specific knobs (--compute_dtype,
--subproc, fake-env opt-in).

Example (tiny smoke run, no MuJoCo assets needed):
    python -m m3l_tpu.cli.train --env FakeInsertion --n_envs 2 \
        --total_timesteps 1024 --rollout_length 256 --dim_embedding 64
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np
from flax import nnx


def str2bool(v: str) -> bool:
    if v.lower() == "true":
        return True
    if v.lower() == "false":
        return False
    raise ValueError(f"boolean argument should be either True or False (got {v})")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("M3L-TPU")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--resume_from",
        type=str,
        default=None,
        help=(
            "checkpoint to restore before learn() (params, optimizer states, "
            "reward normalizer, num_timesteps), or 'auto' to pick the newest "
            "model_*_steps.ckpt under <tensorboard_dir>/checkpoints — lets a "
            "long run survive a relay/tunnel death and continue"
        ),
    )
    parser.add_argument("--save_freq", type=int, default=int(1e5))
    parser.add_argument("--eval_every", type=int, default=int(2e5))
    parser.add_argument("--total_timesteps", type=int, default=int(3e6))
    parser.add_argument("--wandb_dir", type=str, default="./wandb/")
    parser.add_argument("--wandb_id", type=str, default=None)
    parser.add_argument("--wandb_entity", type=str, default=None)
    # Environment.
    parser.add_argument(
        "--env",
        type=str,
        default="tactile_envs/Insertion-v0",
        help=(
            "tactile_envs/Insertion-v0 | Door | HandManipulate*-v1 | "
            "FakeInsertion | MuJoCoPixels/<any gymnasium MuJoCo id>"
        ),
    )
    parser.add_argument("--n_envs", type=int, default=8)
    parser.add_argument("--state_type", type=str, default="vision_and_touch", choices=["vision", "touch", "vision_and_touch"])
    parser.add_argument("--norm_reward", type=str2bool, default=True)
    parser.add_argument("--use_latch", type=str2bool, default=True)
    parser.add_argument("--camera_idx", type=int, default=0, choices=[0, 1, 2, 3])
    parser.add_argument("--frame_stack", type=int, default=4)
    parser.add_argument("--no_rotation", type=str2bool, default=True)
    # MAE.
    parser.add_argument("--representation", type=str2bool, default=True)
    parser.add_argument("--early_conv_masking", type=str2bool, default=True)
    parser.add_argument("--dim_embedding", type=int, default=256)
    parser.add_argument("--use_sincosmod_encodings", type=str2bool, default=True)
    parser.add_argument("--masking_ratio", type=float, default=0.95)
    parser.add_argument("--mae_batch_size", type=int, default=32)
    parser.add_argument("--train_mae_every", type=int, default=1)
    # PPO.
    parser.add_argument("--rollout_length", type=int, default=32768)
    parser.add_argument("--ppo_epochs", type=int, default=10)
    parser.add_argument("--lr_ppo", type=float, default=1e-4)
    parser.add_argument("--vision_only_control", type=str2bool, default=False)
    parser.add_argument("--batch_size", type=int, default=512)
    # PPO-MAE.
    parser.add_argument("--separate_optimizer", type=str2bool, default=False)
    # TPU-specific.
    parser.add_argument(
        "--allow_fake", type=str2bool, default=False,
        help="substitute FakeInsertionEnv when a real env family's package is missing (off by default: a broken install should fail loudly, reference envs/__init__.py has no fallback)",
    )
    parser.add_argument("--compute_dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
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


def build_mesh(config):
    """CLI equivalent of the reference's multi-GPU launch (Lightning Fabric
    ``devices=N`` DDP, SURVEY.md §2.7): returns an N-device ``Mesh`` (dp x mp)
    the algorithm shards params/batches over, or None for single-chip."""
    n = getattr(config, "mesh_devices", 1)
    mp = getattr(config, "mesh_mp", 1)
    if n == 1 and mp == 1:
        return None
    import jax

    from ..train.mesh import make_mesh

    if n == 0:
        n = len(jax.devices())
    return make_mesh(n, mp=mp)


def build_model(config, env):
    """Wire VTT -> VTMAE -> ActorCritic -> PPOMAE per the reference defaults
    (train.py:128-183)."""
    from ..models import VTT, VTTConfig, VTMAE
    from ..rl import ActorCritic, MAEFeatures, PPOMAE

    num_tactiles = 0
    if config.state_type in ("vision_and_touch", "touch"):
        num_tactiles = 2
        if config.env.startswith(("HandManipulate", "MuJoCoPixels/")):
            num_tactiles = 1

    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rngs = nnx.Rngs(config.seed)
    vtt = VTT(
        VTTConfig(
            image_size=(64, 64),
            tactile_size=(32, 32),
            image_patch_size=8,
            tactile_patch_size=4,
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
    policy = ActorCritic(features, config.dim_embedding, env.action_space.shape[0], dtype=dtype, rngs=rngs)
    model = PPOMAE(
        policy,
        env,
        learning_rate=config.lr_ppo,
        n_steps=config.rollout_length // config.n_envs,
        batch_size=config.batch_size,
        n_epochs=config.ppo_epochs,
        mae_batch_size=config.mae_batch_size,
        separate_optimizer=config.separate_optimizer,
        # --representation False = the reference's privileged plain-PPO branch
        # (train.py:190-211): same policy, no MAE updates
        train_mae=config.representation,
        norm_reward=config.norm_reward,
        frame_stack=config.frame_stack,
        mesh=build_mesh(config),
        seed=config.seed,
        verbose=config.verbose,
    )
    return model


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
    if config.resume_from:
        if config.resume_from == "auto":
            import glob

            cands = glob.glob(os.path.join(config.tensorboard_dir or ".", "checkpoints", "model_*_steps.ckpt"))
            cands.sort(key=lambda p: int(p.rsplit("model_", 1)[1].split("_")[0]))
        else:
            cands = [config.resume_from]
        restored = False
        for path in reversed(cands):  # newest first; fall back past a ckpt a dying save corrupted
            try:
                model.load(path)
            except Exception as exc:  # noqa: BLE001 — resume is best-effort by design
                print(f"[resume] failed to restore {path}: {exc!r}")
                continue
            print(f"[resume] restored {path}; continuing from num_timesteps={model.num_timesteps}")
            restored = True
            break
        if not restored:
            print("[resume] no usable checkpoint; starting fresh")
    try:
        callback = None
        if config.tensorboard_dir:
            from ..rl.callbacks import CallbackList, CheckpointCallback, TensorboardCallback
            from ..utils.loggers import TensorBoardLogger

            logger = TensorBoardLogger(config.tensorboard_dir)
            callback = CallbackList([
                TensorboardCallback(logger),
                CheckpointCallback(config.save_freq, config.tensorboard_dir + "/checkpoints"),
            ])
        model.learn(total_timesteps=config.total_timesteps, callback=callback)
    finally:
        env.close()
    return model


if __name__ == "__main__":
    main()
