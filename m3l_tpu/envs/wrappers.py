"""Observation wrappers (host side, numpy).

Capability parity with the reference's observation pipeline:

* :class:`FrameStack` — rolling stack of the last N dict observations along a
  new leading axis per key (reference utils/frame_stack.py:9-112, including
  the reset behaviour of filling the buffer with the initial observation).
* :class:`ResizeDict` — resize a pixel key and rescale to [0, 1]
  (reference utils/resize_dict.py:11-86; cv2 INTER_AREA).
* :class:`AddTactile` — assemble a hand-shaped 3x32x32 tactile image from
  MuJoCo Shadow-hand touch-sensor grids with symlog scaling
  (reference utils/add_tactile.py:11-100).
"""
from __future__ import annotations

from collections import deque

import gymnasium as gym
import numpy as np
from gymnasium.spaces import Box, Dict as DictSpace


class FrameStack(gym.ObservationWrapper):
    def __init__(self, env: gym.Env, num_stack: int):
        super().__init__(env)
        self.num_stack = num_stack
        keys = list(self.env.observation_space.spaces.keys())
        self.frames = {k: deque([], maxlen=num_stack) for k in keys}
        self.observation_space = DictSpace(
            {
                k: Box(
                    low=np.repeat(self.env.observation_space[k].low[None], num_stack, axis=0),
                    high=np.repeat(self.env.observation_space[k].high[None], num_stack, axis=0),
                    dtype=self.env.observation_space[k].dtype,
                )
                for k in keys
            }
        )

    def observation(self, observation):
        return {k: np.stack(self.frames[k], axis=0) for k in self.frames}

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        for k in self.frames:
            self.frames[k].append(obs[k])
        return self.observation(None), reward, terminated, truncated, info

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        for k in self.frames:
            for _ in range(self.num_stack):
                self.frames[k].append(obs[k])
        return self.observation(None), info


class ResizeDict(gym.ObservationWrapper):
    """Resize ``pixel_key`` to (size, size); emits uint8 by default.

    TPU-first deviation from the reference (which emits float32/255): keeping
    images uint8 end-to-end quarters rollout-buffer HBM and host->device
    bandwidth; vt_load dequantizes on device. Set ``to_float=True`` for the
    reference's float [0,1] contract.
    """

    def __init__(self, env: gym.Env, size: int, pixel_key: str = "image", to_float: bool = False):
        super().__init__(env)
        self.size = size
        self.pixel_key = pixel_key
        self.to_float = to_float
        spaces = dict(self.env.observation_space.spaces)
        if to_float:
            spaces[pixel_key] = Box(low=0.0, high=1.0, shape=(size, size, 3), dtype=np.float32)
        else:
            spaces[pixel_key] = Box(low=0, high=255, shape=(size, size, 3), dtype=np.uint8)
        self.observation_space = DictSpace(spaces)

    def observation(self, obs):
        import cv2

        obs = dict(obs)
        img = obs[self.pixel_key]
        if img.shape[0] != self.size or img.shape[1] != self.size:
            img = cv2.resize(img, (self.size, self.size), interpolation=cv2.INTER_AREA)
        if self.to_float:
            img = img.astype(np.float32) / 255.0
        obs[self.pixel_key] = img
        return obs


def symlog(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.log1p(np.abs(x))


def read_touch_sensors(env) -> np.ndarray:
    """All MuJoCo touch-sensor readings of an (unwrapped) env."""
    model = getattr(env, "model", None)
    data = getattr(env, "data", None)
    if model is None or data is None:
        return np.zeros(0, np.float32)
    try:
        import mujoco

        vals = []
        for i in range(model.nsensor):
            if model.sensor_type[i] == mujoco.mjtSensor.mjSENS_TOUCH:
                adr = model.sensor_adr[i]
                vals.append(data.sensordata[adr])
        return np.asarray(vals, np.float32)
    except Exception:
        return np.zeros(0, np.float32)


def assemble_hand_tactile(vals: np.ndarray, size: int = 32) -> np.ndarray:
    """Hand-shaped (3, size, size) tactile map from raw touch readings
    (reference utils/add_tactile.py:81-97 layout intent), symlog-scaled."""
    tac = np.zeros((3, size, size), np.float32)
    if vals.size:
        per_pad = max(1, vals.size // 16)
        v = 0
        for finger in range(5):
            col = finger * 6 + 1
            for pad in range(3):
                row = pad * 4
                chunk = vals[v : v + per_pad]
                if chunk.size:
                    tac[0, row : row + 4, col : col + 4] = chunk.mean()
                v += per_pad
        palm = vals[v:]
        if palm.size:
            tac[0, 20:, 8:24] = palm.mean()
    return symlog(tac)


class AddTactile(gym.ObservationWrapper):
    """Build a (3, 32, 32) tactile map from Shadow-hand touch sensors.

    The reference reads 17 named MuJoCo touch-sensor grids (palm, finger
    proximal/middle/distal pads) and pastes them into a hand-shaped 32x32
    layout per force axis, then symlogs (reference utils/add_tactile.py:30-97).
    Layout here: five fingers as 6-wide columns (2 px gutters) with three
    4-row pad bands, palm as the lower 12 rows — preserving the reference's
    spatial-adjacency intent without depending on its exact sensor names.
    """

    N_CHANNELS = 3
    SIZE = 32

    def __init__(self, env: gym.Env):
        super().__init__(env)
        spaces = dict(self.env.observation_space.spaces)
        spaces["tactile"] = Box(low=-np.inf, high=np.inf, shape=(self.N_CHANNELS, self.SIZE, self.SIZE), dtype=np.float32)
        self.observation_space = DictSpace(spaces)

    def _touch_values(self) -> np.ndarray:
        return read_touch_sensors(self.unwrapped)

    def observation(self, obs):
        obs = dict(obs)
        obs["tactile"] = assemble_hand_tactile(self._touch_values(), self.SIZE)
        return obs


class RenderImageObservation(gym.Wrapper):
    """Add an 'image' key rendered off-screen (EGL) to any MuJoCo env, plus a
    'tactile' key from the env's touch sensors when present (zeros otherwise)
    — the generic pixels+touch pipeline the reference builds per env family
    (envs/__init__.py:70-76 PixelObservationWrapper + ResizeDict + AddTactile).
    Replaces the state observation entirely (pixel-only control)."""

    def __init__(self, env: gym.Env, size: int = 64, tactile_size: int = 32, with_tactile: bool = True):
        super().__init__(env)
        self.size = size
        self.tactile_size = tactile_size
        self.with_tactile = with_tactile
        spaces = {"image": Box(low=0, high=255, shape=(size, size, 3), dtype=np.uint8)}
        if with_tactile:
            spaces["tactile"] = Box(low=-np.inf, high=np.inf, shape=(3, tactile_size, tactile_size), dtype=np.float32)
        self.observation_space = DictSpace(spaces)

    def _obs(self):
        import cv2

        frame = self.env.render()
        if frame.shape[0] != self.size:
            frame = cv2.resize(frame, (self.size, self.size), interpolation=cv2.INTER_AREA)
        obs = {"image": np.asarray(frame, np.uint8)}
        if self.with_tactile:
            obs["tactile"] = assemble_hand_tactile(read_touch_sensors(self.env.unwrapped), self.tactile_size)
        return obs

    def reset(self, **kwargs):
        _, info = self.env.reset(**kwargs)
        return self._obs(), info

    def step(self, action):
        _, reward, term, trunc, info = self.env.step(action)
        return self._obs(), reward, term, trunc, info
