"""Contract tests for the never-executed-here real-env factory branches.

The external ``tactile_envs`` and ``robosuite`` packages are absent from this
image, so the Insertion and Door branches of ``envs/factory.py`` could only
fail loudly — their *wiring* (constructor kwargs, wrapper order, dict-obs
shapes) was untested (VERDICT r3 missing #3 / next #5). These tests install
minimal in-test stub packages exposing exactly the API surface the factory
uses — mirroring the reference call sites (`/root/reference/envs/__init__.py:33-90`)
— and assert the wrapped observation pipeline end-to-end, including that the
factory output feeds ``vt_load`` at the shapes the models expect.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

import gymnasium as gym
from gymnasium.spaces import Box, Dict as DictSpace


def _obs_spaces(state_type: str, num_sensors: int = 2):
    spaces = {}
    if state_type in ("vision", "vision_and_touch"):
        spaces["image"] = Box(0, 255, (64, 64, 3), np.uint8)
    if state_type in ("touch", "vision_and_touch"):
        spaces["tactile"] = Box(-np.inf, np.inf, (3 * num_sensors, 32, 32), np.float32)
    return DictSpace(spaces)


def _sample(space):
    out = {}
    for k, sp in space.spaces.items():
        if sp.dtype == np.uint8:
            out[k] = np.full(sp.shape, 127, np.uint8)
        else:
            out[k] = np.zeros(sp.shape, np.float32)
    return out


# --------------------------------------------------------------------------- #
# tactile_envs (Insertion) stub
# --------------------------------------------------------------------------- #


class _StubInsertionEnv(gym.Env):
    """API surface of ``tactile_envs`` Insertion (reference
    envs/__init__.py:77-90 gym.make kwargs): dict obs image(64,64,3)+
    tactile(6,32,32) channels-first, 3-d action."""

    last_kwargs: dict = {}

    def __init__(self, **kwargs):
        type(self).last_kwargs = dict(kwargs)
        self.observation_space = _obs_spaces(kwargs.get("state_type", "vision_and_touch"))
        self.action_space = Box(-1.0, 1.0, (3,), np.float32)

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        return _sample(self.observation_space), {}

    def step(self, action):
        return _sample(self.observation_space), 0.0, False, False, {}


@pytest.fixture
def tactile_envs_stub(monkeypatch):
    mod = types.ModuleType("tactile_envs")
    monkeypatch.setitem(sys.modules, "tactile_envs", mod)
    gym.register(
        id="tactile_envs/Insertion-v0",
        entry_point=_StubInsertionEnv,
        disable_env_checker=True,
    )
    _StubInsertionEnv.last_kwargs = {}
    yield mod
    del gym.registry["tactile_envs/Insertion-v0"]


def test_insertion_branch_kwargs_and_obs(tactile_envs_stub):
    from m3l_tpu.envs.factory import make_env

    env = make_env(
        "tactile_envs/Insertion-v0",
        rank=3,
        seed=11,
        state_type="vision_and_touch",
        camera_idx=2,
        objects=("square", "triangle"),
        holders=("holder2",),
        frame_stack=4,
        no_rotation=True,
        skip_frame=2,
        allow_fake=False,
    )()
    kw = _StubInsertionEnv.last_kwargs
    # reference gym.make call contract (envs/__init__.py:81-90)
    assert kw["state_type"] == "vision_and_touch"
    assert kw["camera_idx"] == 2
    assert kw["symlog_tactile"] is True
    assert kw["env_id"] == 3
    assert kw["holders"] == ["holder2"]
    assert kw["objects"] == ["square", "triangle"]
    assert kw["no_rotation"] is True
    assert kw["skip_frame"] == 2

    obs, _ = env.reset(seed=0)
    assert set(obs) == {"image", "tactile"}
    assert obs["image"].shape == (4, 64, 64, 3) and obs["image"].dtype == np.uint8
    assert obs["tactile"].shape == (4, 6, 32, 32) and obs["tactile"].dtype == np.float32
    obs2, r, term, trunc, info = env.step(env.action_space.sample())
    assert obs2["image"].shape == (4, 64, 64, 3)

    # the factory output must feed the model-side packer at model shapes
    from m3l_tpu.utils.obs import vt_load

    batch = {k: np.stack([v, v]) for k, v in obs.items()}
    packed = vt_load(batch, frame_stack=4)
    assert packed["image"].shape == (2, 64, 64, 12)
    assert packed["tactile1"].shape == (2, 32, 32, 12)
    assert packed["tactile2"].shape == (2, 32, 32, 12)


def test_insertion_branch_vision_only(tactile_envs_stub):
    from m3l_tpu.envs.factory import make_env

    env = make_env(
        "tactile_envs/Insertion-v0", rank=0, state_type="vision", frame_stack=2, allow_fake=False
    )()
    assert _StubInsertionEnv.last_kwargs["state_type"] == "vision"
    obs, _ = env.reset(seed=0)
    assert set(obs) == {"image"}
    assert obs["image"].shape == (2, 64, 64, 3)


# --------------------------------------------------------------------------- #
# robosuite (Door) stub
# --------------------------------------------------------------------------- #


class _StubRobosuiteRaw:
    """Stands in for the raw (non-gym) robosuite env returned by suite.make."""

    def __init__(self, env_name, **kwargs):
        self.env_name = env_name
        self.kwargs = kwargs


class _StubTactileWrapper(gym.Env):
    """API surface of the reference fork's robosuite TactileWrapper
    (envs/__init__.py:49-68: wraps suite.make output, takes env_id +
    state_type, exposes dict obs like the Insertion family)."""

    last_init: dict = {}

    def __init__(self, env, env_id=0, state_type="vision_and_touch"):
        assert isinstance(env, _StubRobosuiteRaw)
        type(self).last_init = {"env": env, "env_id": env_id, "state_type": state_type}
        self.observation_space = _obs_spaces(state_type)
        self.action_space = Box(-1.0, 1.0, (7,), np.float32)

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        return _sample(self.observation_space), {}

    def step(self, action):
        return _sample(self.observation_space), 0.0, False, False, {}


@pytest.fixture
def robosuite_stub(monkeypatch):
    suite = types.ModuleType("robosuite")
    suite.make = _StubRobosuiteRaw
    suite.load_controller_config = lambda default_controller: {"type": default_controller}
    wrappers = types.ModuleType("robosuite.wrappers")
    tw = types.ModuleType("robosuite.wrappers.tactile_wrapper")
    tw.TactileWrapper = _StubTactileWrapper
    wrappers.tactile_wrapper = tw
    suite.wrappers = wrappers
    monkeypatch.setitem(sys.modules, "robosuite", suite)
    monkeypatch.setitem(sys.modules, "robosuite.wrappers", wrappers)
    monkeypatch.setitem(sys.modules, "robosuite.wrappers.tactile_wrapper", tw)
    _StubTactileWrapper.last_init = {}
    yield suite


def test_door_branch_kwargs_and_obs(robosuite_stub):
    from m3l_tpu.envs.factory import make_env

    env = make_env("Door", rank=5, seed=0, state_type="vision_and_touch", frame_stack=4, allow_fake=False)()

    init = _StubTactileWrapper.last_init
    assert init["env_id"] == 5 and init["state_type"] == "vision_and_touch"
    raw = init["env"]
    # reference suite.make call contract (envs/__init__.py:50-66)
    assert raw.env_name == "Door"
    kw = raw.kwargs
    assert kw["robots"] == ["PandaTactile"]
    assert kw["use_camera_obs"] is True and kw["use_object_obs"] is False
    assert kw["has_offscreen_renderer"] is True and kw["has_renderer"] is False
    assert kw["reward_shaping"] is True
    assert kw["camera_names"] == "agentview"
    assert kw["horizon"] == 300
    assert kw["camera_heights"] == 64 and kw["camera_widths"] == 64
    assert kw["controller_configs"] == {"type": "OSC_POSE"}
    assert kw["robot_configs"] == [{"initial_qpos": [-0.073, 0.016, -0.392, -2.502, 0.240, 2.676, 0.189]}]
    assert kw["initialization_noise"] is None
    assert kw["placement_initializer"] is None

    obs, _ = env.reset(seed=0)
    assert obs["image"].shape == (4, 64, 64, 3)
    assert obs["tactile"].shape == (4, 6, 32, 32)


def test_door_branch_missing_package_raises(monkeypatch):
    # without the stub (package truly absent) allow_fake=False must raise
    from m3l_tpu.envs.factory import make_env

    monkeypatch.setitem(sys.modules, "robosuite", None)  # force ImportError
    with pytest.raises(ImportError):
        make_env("Door", rank=0, allow_fake=False)()
