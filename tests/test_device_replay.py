"""DeviceReplayBuffer == host ReplayBuffer semantics (same transitions, same
sampling rng -> identical batches up to storage precision), including SB3
handle_timeout_termination (reference SB3 ReplayBuffer / models/sac_mae.py:240)."""
import numpy as np
import pytest
from gymnasium.spaces import Box, Dict as DictSpace

from m3l_tpu.rl.replay import DeviceReplayBuffer, ReplayBuffer


def _space():
    return DictSpace(
        {
            "image": Box(low=0, high=255, shape=(8, 8, 3), dtype=np.uint8),
            "tactile": Box(low=-np.inf, high=np.inf, shape=(2, 4, 4), dtype=np.float32),
        }
    )


def _roll(buf, n_steps, n_envs, rng, horizon=7):
    t_in_ep = np.zeros(n_envs, int)
    for t in range(n_steps):
        obs = {
            "image": rng.integers(0, 255, (n_envs, 8, 8, 3), dtype=np.uint8),
            "tactile": rng.normal(size=(n_envs, 2, 4, 4)).astype(np.float32),
        }
        actions = rng.normal(size=(n_envs, 3)).astype(np.float32)
        rewards = rng.normal(size=(n_envs,)).astype(np.float32)
        t_in_ep += 1
        dones = (t_in_ep >= horizon) | (rng.random(n_envs) < 0.05)
        infos = []
        for e in range(n_envs):
            info = {}
            if dones[e] and t_in_ep[e] >= horizon:
                info["TimeLimit.truncated"] = True
                info["terminal_observation"] = {
                    "image": rng.integers(0, 255, (8, 8, 3), dtype=np.uint8),
                    "tactile": rng.normal(size=(2, 4, 4)).astype(np.float32),
                }
            infos.append(info)
        t_in_ep[dones] = 0
        buf.add(obs, actions, rewards, dones.astype(np.float32), infos)


def test_device_replay_matches_host():
    n_envs, steps = 2, 40
    host = ReplayBuffer(30 * n_envs, n_envs, _space(), 3)
    dev = DeviceReplayBuffer(30 * n_envs, n_envs, _space(), 3, timeout_capacity=64)
    _roll(host, steps, n_envs, np.random.default_rng(0))
    _roll(dev, steps, n_envs, np.random.default_rng(0))
    assert len(host) == len(dev)
    assert host.full and dev.full

    b_h = host.sample(64, np.random.default_rng(7))
    b_d = dev.sample(64, np.random.default_rng(7))
    b_d = {k: ({kk: np.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict) else np.asarray(v)) for k, v in b_d.items()}
    np.testing.assert_array_equal(b_h["actions"], b_d["actions"])
    np.testing.assert_array_equal(b_h["rewards"], b_d["rewards"])
    np.testing.assert_array_equal(b_h["dones"], b_d["dones"])
    for key in ("obs", "next_obs"):
        np.testing.assert_array_equal(b_h[key]["image"], b_d[key]["image"])
        # host stores tactile f16, device bf16 — compare against the f32
        # source with bf16 tolerance
        np.testing.assert_allclose(b_h[key]["tactile"], b_d[key]["tactile"], rtol=2e-2, atol=2e-2)
    assert b_d["obs"]["tactile"].dtype == np.float32


def test_device_replay_guards():
    dev = DeviceReplayBuffer(10, 1, _space(), 3)
    with pytest.raises(ValueError):
        dev.sample(4, np.random.default_rng(0))
