"""Replay buffer for off-policy training (host numpy ring).

Memory-optimized relative to the reference's SB3 ReplayBuffer (which stores
obs and next_obs separately in float32): observations are stored ONCE in a
ring (next_obs is the ring's next slot, valid because the TD target masks
next-state values on terminal steps), images stay uint8 and tactile maps
float16. Truncated (timeout) episodes, whose real next observation is the
terminal one rather than the auto-reset obs, keep their terminal obs in a
sparse side table so SB3's ``handle_timeout_termination`` bootstrap semantics
hold exactly.
"""
from __future__ import annotations

import numpy as np

_STORE_DTYPES = {np.dtype(np.float32): np.float16}


class ReplayBuffer:
    def __init__(self, capacity: int, n_envs: int, obs_space, action_dim: int):
        self.capacity = max(capacity // n_envs, 1)
        self.n_envs = n_envs
        self.obs = {}
        self._obs_dtypes = {}
        for k, sp in obs_space.spaces.items():
            store = _STORE_DTYPES.get(np.dtype(sp.dtype), sp.dtype)
            self.obs[k] = np.zeros((self.capacity, n_envs, *sp.shape), store)
            self._obs_dtypes[k] = sp.dtype
        self.actions = np.zeros((self.capacity, n_envs, action_dim), np.float32)
        self.rewards = np.zeros((self.capacity, n_envs), np.float32)
        self.dones = np.zeros((self.capacity, n_envs), np.float32)
        self.timeouts = np.zeros((self.capacity, n_envs), np.float32)
        self._timeout_obs: dict[tuple[int, int], dict] = {}
        self.pos = 0
        self.full = False

    def __len__(self):
        return (self.capacity if self.full else self.pos) * self.n_envs

    def add(self, obs: dict, actions, rewards, dones, infos) -> None:
        p = self.pos
        for k in self.obs:
            self.obs[k][p] = obs[k]
        self.actions[p] = actions
        self.rewards[p] = rewards
        self.dones[p] = dones.astype(np.float32)
        for e, info in enumerate(infos):
            timeout = bool(info.get("TimeLimit.truncated", False))
            self.timeouts[p, e] = float(timeout)
            key = (p, e)
            if timeout and "terminal_observation" in info:
                self._timeout_obs[key] = info["terminal_observation"]
            else:
                self._timeout_obs.pop(key, None)
        self.pos += 1
        if self.pos == self.capacity:
            self.full = True
            self.pos = 0

    def sample(self, batch_size: int, rng: np.random.Generator) -> dict:
        # exclude the newest slot (pos-1): its "next" slot is not written yet
        # (or holds the ring's oldest frame when full)
        if self.full:
            idx = (rng.integers(0, self.capacity - 1, batch_size) + self.pos) % self.capacity
        else:
            if self.pos < 2:
                # with a single written slot, slot 0's ring-successor is still
                # unwritten garbage — there is no valid transition to sample
                raise ValueError("ReplayBuffer.sample needs at least two written time slots")
            idx = rng.integers(0, self.pos - 1, batch_size)
        env_idx = rng.integers(0, self.n_envs, batch_size)
        next_idx = (idx + 1) % self.capacity

        def get_obs(k, rows, envs):
            return self.obs[k][rows, envs].astype(self._obs_dtypes[k])

        obs = {k: get_obs(k, idx, env_idx) for k in self.obs}
        next_obs = {k: get_obs(k, next_idx, env_idx) for k in self.obs}
        # patch truncated transitions with their stored terminal observation
        for j in range(batch_size):
            key = (int(idx[j]), int(env_idx[j]))
            if self.timeouts[idx[j], env_idx[j]] and key in self._timeout_obs:
                term = self._timeout_obs[key]
                for k in next_obs:
                    next_obs[k][j] = term[k]
        # SB3 handle_timeout_termination: don't treat timeouts as terminal
        dones = self.dones[idx, env_idx] * (1.0 - self.timeouts[idx, env_idx])
        return {
            "obs": obs,
            "next_obs": next_obs,
            "actions": self.actions[idx, env_idx],
            "rewards": self.rewards[idx, env_idx],
            "dones": dones.astype(np.float32),
        }
