"""Callbacks: checkpoint/eval/tensorboard wiring on a tiny PPO run."""
import pytest
import os

import numpy as np

from m3l_tpu.envs import FakeInsertionEnv, FrameStack, SyncVecEnv, make_env
from m3l_tpu.rl.callbacks import CallbackList, CheckpointCallback, EvalCallback, TensorboardCallback
from m3l_tpu.cli.train import build_model, build_parser


def tiny_model():
    argv = []
    for k, v in dict(env="FakeInsertion", n_envs=2, rollout_length=64, batch_size=16, ppo_epochs=1,
                     dim_embedding=32, frame_stack=2, mae_batch_size=8, compute_dtype="float32",
                     subproc=False, verbose=0).items():
        argv += [f"--{k}", str(v)]
    config = build_parser().parse_args(argv)
    env = SyncVecEnv([make_env(config.env, i, 0, config.state_type, frame_stack=2) for i in range(2)])
    return build_model(config, env), env


@pytest.mark.slow
def test_checkpoint_and_eval_callbacks(tmp_path):
    model, env = tiny_model()

    def eval_env_fn():
        return FrameStack(FakeInsertionEnv(seed=1, horizon=20), 2)

    ckpt = CheckpointCallback(save_freq=64, save_path=str(tmp_path / "ck"))
    evalcb = EvalCallback(eval_env_fn, eval_every=64, video_dir=str(tmp_path / "vid"), max_steps=20)
    cb = CallbackList([ckpt, evalcb])
    model.learn(total_timesteps=128, callback=cb)
    env.close()
    ck_files = os.listdir(tmp_path / "ck")
    assert any(f.endswith(".ckpt") for f in ck_files), ck_files
    assert any(f.endswith(".vecnorm.pkl") for f in ck_files)
    assert evalcb.history, "eval never ran"
    assert np.isfinite(evalcb.history[0]["eval/ep_reward"])
    vids = os.listdir(tmp_path / "vid")
    assert any(v.endswith(".mp4") for v in vids)


def test_tensorboard_logger(tmp_path):
    from m3l_tpu.utils.loggers import TensorBoardLogger

    model, env = tiny_model()
    logger = TensorBoardLogger(str(tmp_path / "tb"))
    cb = TensorboardCallback(logger)
    model.learn(total_timesteps=64, callback=cb)
    env.close()
    files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in files)


def test_annotate_and_write_video(tmp_path):
    from m3l_tpu.utils.video import annotate_frame, write_video

    frames = [annotate_frame(i, np.random.default_rng(i).random((64, 64, 3)).astype(np.float32), 0.5 * i, {"is_success": False}) for i in range(5)]
    assert frames[0].shape[0] >= 128  # upscaled for caption readability
    path = write_video(frames, str(tmp_path / "v" / "test.mp4"))
    assert os.path.getsize(path) > 0
