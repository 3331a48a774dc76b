"""Fake visuo-tactile envs for tests and benchmarks.

The real workloads (tactile_envs Insertion, robosuite Door, Shadow-hand
rotation) need MuJoCo scene assets not shipped here; these fakes reproduce
the *observation/action contract* — dict obs {image uint8 (64,64,3),
tactile float32 (6,32,32) in symlog range} and a continuous Box action —
with deterministic, seedable dynamics so the RL loop can be integration-
tested end-to-end on any host (SURVEY.md §4: the rebuild must supply the
fake-env test layer the reference lacks).

Reward is a smooth function of an internal latent the agent nudges with its
actions, so learning progress is measurable (a correct PPO implementation
improves the return).
"""
from __future__ import annotations

import gymnasium as gym
import numpy as np
from gymnasium.spaces import Box, Dict as DictSpace


class FakeInsertionEnv(gym.Env):
    metadata = {"render_modes": ["rgb_array"]}

    def __init__(
        self,
        image_size: int = 64,
        tactile_size: int = 32,
        num_sensors: int = 2,
        action_dim: int = 3,
        horizon: int = 300,
        state_type: str = "vision_and_touch",
        seed: int | None = None,
    ):
        self.image_size = image_size
        self.tactile_size = tactile_size
        self.num_sensors = num_sensors
        self.horizon = horizon
        self.state_type = state_type
        spaces = {}
        if state_type in ("vision", "vision_and_touch"):
            spaces["image"] = Box(low=0, high=255, shape=(image_size, image_size, 3), dtype=np.uint8)
        if state_type in ("touch", "vision_and_touch"):
            spaces["tactile"] = Box(
                low=-np.inf, high=np.inf, shape=(3 * num_sensors, tactile_size, tactile_size), dtype=np.float32
            )
        self.observation_space = DictSpace(spaces)
        self.action_space = Box(low=-1.0, high=1.0, shape=(action_dim,), dtype=np.float32)
        self._rng = np.random.default_rng(seed)
        self._target = np.zeros(action_dim, np.float32)
        self._pos = np.zeros(action_dim, np.float32)
        self._t = 0

    _GRID_CACHE: dict = {}

    @classmethod
    def _grid(cls, s: int):
        # cached meshgrid: _obs runs every env step and the 1-core host makes
        # per-step mgrid allocation a measurable share of rollout collection
        if s not in cls._GRID_CACHE:
            yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
            cls._GRID_CACHE[s] = (yy, xx)
        return cls._GRID_CACHE[s]

    @staticmethod
    def _blob(yy, xx, p, base_r: float = 0.02):
        """Gaussian blob at the camera projection of latent point ``p``.

        x/y map through tanh to the frame; the third coordinate (when the
        latent is 3-D) modulates apparent size, the way depth scales an
        object in a real camera image — so the full latent is observable,
        matching the reference task where the camera sees both the held
        object and the socket (tactile_envs Insertion; SURVEY.md §2.2).
        """
        cx = 0.5 + 0.4 * float(np.tanh(p[0]))
        cy = 0.5 + 0.4 * float(np.tanh(p[1 % len(p)]))
        r = base_r * (1.0 + 0.6 * float(np.tanh(p[2]))) if len(p) > 2 else base_r
        return np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / r))

    def _obs(self) -> dict:
        obs = {}
        s = self.image_size
        if "image" in self.observation_space.spaces:
            # two blobs: the controlled "peg" (red/blue) and the episode's
            # "socket" target (green) — both visible, as in the reference's
            # camera view of the Insertion scene
            yy, xx = self._grid(s)
            blob = self._blob(yy, xx, self._pos)
            tgt = self._blob(yy, xx, self._target)
            img = np.stack([blob, np.maximum(0.5 * blob, tgt), 1.0 - blob], axis=-1)
            obs["image"] = (img * 255).astype(np.uint8)
        if "tactile" in self.observation_space.spaces:
            ts = self.tactile_size
            yy, xx = self._grid(ts)
            contact = float(np.exp(-np.sum((self._pos - self._target) ** 2)))
            maps = []
            for k in range(self.num_sensors):
                phase = 0.5 * k
                m = contact * np.exp(-(((xx - 0.5) ** 2 + (yy - 0.5 - 0.1 * np.sin(phase + self._t / 10)) ** 2) / 0.05))
                maps += [m, m * 0.5, m * 0.25]
            tac = np.stack(maps, axis=0).astype(np.float32)
            obs["tactile"] = np.sign(tac) * np.log1p(np.abs(tac * 5))
        return obs

    def reset(self, *, seed: int | None = None, options=None):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self._target = self._rng.uniform(-0.5, 0.5, self.action_space.shape).astype(np.float32)
        self._pos = np.zeros(self.action_space.shape, np.float32)
        self._t = 0
        return self._obs(), {}

    def step(self, action):
        action = np.clip(np.asarray(action, np.float32), -1.0, 1.0)
        # clamp the latent so the task stays observable (the blob position
        # saturates at tanh(+-1.5)) and returns stay well-scaled
        self._pos = np.clip(self._pos + 0.1 * action, -1.5, 1.5)
        self._t += 1
        dist = float(np.linalg.norm(self._pos - self._target))
        reward = -dist + (1.0 if dist < 0.1 else 0.0)
        terminated = dist < 0.05
        truncated = self._t >= self.horizon
        return self._obs(), reward, terminated, truncated, {"is_success": terminated}

    def render(self):
        return self._obs().get("image", np.zeros((self.image_size, self.image_size, 3), np.uint8))
