"""Rollout storage for on-policy training.

Host-side preallocated numpy arrays filled during collection (the env pool
is a host process boundary), bulk-transferred to device once per iteration
for the jitted update phase. Images stay uint8 end-to-end (4x less HBM and
host->device bandwidth than the reference's float32 SB3 buffer); vt_load
dequantizes inside the jitted update.
"""
from __future__ import annotations

import jax
import numpy as np


class RolloutBuffer:
    def __init__(self, n_steps: int, n_envs: int, obs_space, action_dim: int):
        self.n_steps, self.n_envs = n_steps, n_envs
        self.obs = {
            k: np.zeros((n_steps, n_envs, *sp.shape), sp.dtype) for k, sp in obs_space.spaces.items()
        }
        self.actions = np.zeros((n_steps, n_envs, action_dim), np.float32)
        self.rewards = np.zeros((n_steps, n_envs), np.float32)
        self.episode_starts = np.zeros((n_steps, n_envs), np.float32)
        self.values = np.zeros((n_steps, n_envs), np.float32)
        self.log_probs = np.zeros((n_steps, n_envs), np.float32)
        self.pos = 0

    def add(self, obs: dict, actions, rewards, episode_starts, values, log_probs) -> None:
        t = self.pos
        for k in self.obs:
            self.obs[k][t] = obs[k]
        self.actions[t] = actions
        self.rewards[t] = rewards
        self.episode_starts[t] = episode_starts
        self.values[t] = values
        self.log_probs[t] = log_probs
        self.pos += 1

    def reset(self) -> None:
        self.pos = 0

    @property
    def full(self) -> bool:
        return self.pos == self.n_steps

    def to_device(self) -> dict:
        """Flatten (T, E) -> N and transfer. One bulk copy per iteration."""
        n = self.n_steps * self.n_envs

        def flat(a):
            return a.reshape(n, *a.shape[2:])

        data = {
            "obs": {k: flat(v) for k, v in self.obs.items()},
            "actions": flat(self.actions),
            "values": self.values.reshape(n),
            "log_probs": self.log_probs.reshape(n),
        }
        return jax.device_put(data)
