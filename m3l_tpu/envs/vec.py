"""Vectorized environment pools (host side).

The process boundary of the RL path: MuJoCo stepping/rendering cannot run on
TPU, so envs run on host CPUs and the policy sees batched observations
(SURVEY.md §7 hard-part #1). Two pools:

* :class:`SyncVecEnv` — in-process loop (reference ``DummyVecEnv`` role).
* :class:`SubprocVecEnv` — one OS process per env over pipes (reference uses
  SB3's SubprocVecEnv, train.py:122-125), with batched obs assembly.

Both implement SB3 VecEnv step semantics the algorithms rely on: auto-reset
on done, ``terminal_observation`` + ``TimeLimit.truncated`` in infos, and
Monitor-style ``episode`` stats ({r, l}) computed from *raw* rewards.
"""
from __future__ import annotations

import multiprocessing as mp
from typing import Callable, Sequence

import numpy as np


def _stack_obs(obs_list: Sequence[dict]) -> dict:
    return {k: np.stack([o[k] for o in obs_list]) for k in obs_list[0]}


class _Monitor:
    """Episode return/length/success accounting over raw rewards (the
    reference's Monitor + TensorboardCallback avg_success,
    utils/callbacks.py:12-22)."""

    def __init__(self):
        self.ret = 0.0
        self.len = 0
        self.success = False

    def step(self, reward: float, info: dict | None = None) -> None:
        self.ret += float(reward)
        self.len += 1
        if info is not None and info.get("is_success", False):
            self.success = True

    def pop(self) -> dict:
        ep = {"r": self.ret, "l": self.len, "s": float(self.success)}
        self.ret, self.len, self.success = 0.0, 0, False
        return ep


class SyncVecEnv:
    def __init__(self, env_fns: Sequence[Callable]):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.observation_space = self.envs[0].observation_space
        self.action_space = self.envs[0].action_space
        self._monitors = [_Monitor() for _ in self.envs]

    def reset(self, seed: int | None = None) -> dict:
        obs = []
        for i, env in enumerate(self.envs):
            o, _ = env.reset(seed=None if seed is None else seed + i)
            obs.append(o)
        return _stack_obs(obs)

    def step(self, actions: np.ndarray):
        obs_list, rewards, dones, infos = [], [], [], []
        for i, env in enumerate(self.envs):
            o, r, term, trunc, info = env.step(actions[i])
            self._monitors[i].step(r, info)
            done = term or trunc
            info = dict(info)
            if done:
                info["terminal_observation"] = o
                info["TimeLimit.truncated"] = bool(trunc and not term)
                info["episode"] = self._monitors[i].pop()
                o, _ = env.reset()
            obs_list.append(o)
            rewards.append(r)
            dones.append(done)
            infos.append(info)
        return _stack_obs(obs_list), np.asarray(rewards, np.float32), np.asarray(dones, bool), infos

    def close(self):
        for env in self.envs:
            env.close()

    def env_method(self, name, *args, indices=None, **kwargs):
        idx = range(self.num_envs) if indices is None else indices
        return [getattr(self.envs[i], name)(*args, **kwargs) for i in idx]


def _worker(remote, parent_remote, env_fn):
    parent_remote.close()
    env = env_fn()
    monitor = _Monitor()
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                o, r, term, trunc, info = env.step(data)
                monitor.step(r, info)
                done = term or trunc
                info = dict(info)
                if done:
                    info["terminal_observation"] = o
                    info["TimeLimit.truncated"] = bool(trunc and not term)
                    info["episode"] = monitor.pop()
                    o, _ = env.reset()
                remote.send((o, r, done, info))
            elif cmd == "reset":
                o, _ = env.reset(seed=data)
                remote.send(o)
            elif cmd == "get_spaces":
                remote.send((env.observation_space, env.action_space))
            elif cmd == "env_method":
                name, args, kwargs = data
                remote.send(getattr(env, name)(*args, **kwargs))
            elif cmd == "close":
                env.close()
                remote.close()
                break
    except (KeyboardInterrupt, EOFError):
        pass


class SubprocVecEnv:
    def __init__(self, env_fns: Sequence[Callable], start_method: str = "fork"):
        ctx = mp.get_context(start_method)
        self.num_envs = len(env_fns)
        self.remotes, self.work_remotes = zip(*[ctx.Pipe() for _ in range(self.num_envs)])
        self.processes = []
        for wr, r, fn in zip(self.work_remotes, self.remotes, env_fns):
            p = ctx.Process(target=_worker, args=(wr, r, fn), daemon=True)
            p.start()
            wr.close()
            self.processes.append(p)
        self.remotes[0].send(("get_spaces", None))
        self.observation_space, self.action_space = self.remotes[0].recv()

    def reset(self, seed: int | None = None) -> dict:
        for i, r in enumerate(self.remotes):
            r.send(("reset", None if seed is None else seed + i))
        return _stack_obs([r.recv() for r in self.remotes])

    def step(self, actions: np.ndarray):
        for r, a in zip(self.remotes, actions):
            r.send(("step", a))
        results = [r.recv() for r in self.remotes]
        obs, rewards, dones, infos = zip(*results)
        return _stack_obs(obs), np.asarray(rewards, np.float32), np.asarray(dones, bool), list(infos)

    def env_method(self, name, *args, indices=None, **kwargs):
        idx = range(self.num_envs) if indices is None else indices
        for i in idx:
            self.remotes[i].send(("env_method", (name, args, kwargs)))
        return [self.remotes[i].recv() for i in idx]

    def close(self):
        for r in self.remotes:
            try:
                r.send(("close", None))
            except BrokenPipeError:
                pass
        for p in self.processes:
            p.join(timeout=5)


def make_vec_env(env_fns: Sequence[Callable], subproc: bool = True, backend: str = "shm"):
    """Process pool below 100 envs, Sync above — mirroring the reference's
    SubprocVecEnv/DummyVecEnv switch (train.py:122-125). Default backend is
    the zero-copy shared-memory pool (envs/shm_vec.py); ``backend="pipe"``
    selects the classic pickling SubprocVecEnv."""
    if subproc and len(env_fns) < 100:
        if backend == "shm":
            try:
                from .shm_vec import SharedMemoryVecEnv

                return SharedMemoryVecEnv(env_fns)
            except Exception:
                pass  # fall back to pipes (e.g. dict-obs space unsupported)
        return SubprocVecEnv(env_fns)
    return SyncVecEnv(env_fns)
