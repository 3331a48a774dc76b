"""Shared-memory vec env: parity with SubprocVecEnv + throughput sanity."""
import time

import numpy as np
import pytest

from m3l_tpu.envs import FakeInsertionEnv, FrameStack, SharedMemoryVecEnv, SubprocVecEnv, make_env


def fns(n=2, fs=2):
    return [make_env("FakeInsertion", i, 0, "vision_and_touch", frame_stack=fs) for i in range(n)]


def test_shm_vec_env_matches_subproc():
    shm = SharedMemoryVecEnv(fns())
    sub = SubprocVecEnv(fns())
    o1 = shm.reset(seed=0)
    o2 = sub.reset(seed=0)
    for k in o1:
        np.testing.assert_array_equal(o1[k], o2[k])
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
        o1, r1, d1, i1 = shm.step(a)
        o2, r2, d2, i2 = sub.step(a)
        np.testing.assert_allclose(r1, r2, rtol=1e-6)
        for k in o1:
            np.testing.assert_array_equal(o1[k], o2[k])
    shm.close()
    sub.close()


def test_shm_vec_episode_stats_and_autoreset():
    env = SharedMemoryVecEnv([lambda: FrameStack(FakeInsertionEnv(horizon=5, seed=0), 2)])
    env.reset(seed=0)
    saw_episode = False
    for _ in range(12):
        obs, r, d, infos = env.step(np.zeros((1, 3), np.float32))
        if d[0]:
            assert "episode" in infos[0] and "terminal_observation" in infos[0]
            saw_episode = True
    env.close()
    assert saw_episode


def test_shm_obs_are_copies():
    env = SharedMemoryVecEnv(fns(n=1))
    o1 = env.reset(seed=0)
    img1 = o1["image"].copy()
    env.step(np.ones((1, 3), np.float32))
    np.testing.assert_array_equal(o1["image"], img1)  # prior batch unchanged
    env.close()
