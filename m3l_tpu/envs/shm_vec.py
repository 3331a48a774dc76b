"""Shared-memory vectorized env pool (zero-copy observation transport).

The reference's SubprocVecEnv (and ours in envs/vec.py) pickles every dict
observation through a pipe — ~50-200 KB per env per step of serialization on
the host's critical path (SURVEY.md §3 hot-loop #3). This pool instead has
each worker write its observation directly into a preallocated
``multiprocessing.shared_memory`` block; the parent assembles batched obs as
numpy views with no copies or pickling. Rewards/dones/infos still travel the
pipe (tiny).

This is the TPU-native answer to the reference's DataLoader-worker tricks
(ppo_mae_improved.py:268-269): remove the host serialization instead of
hiding it behind more workers.
"""
from __future__ import annotations

import multiprocessing as mp
from multiprocessing import shared_memory
from typing import Callable, Sequence

import numpy as np

from .vec import _Monitor


def _worker(remote, parent_remote, env_fn, shm_names, shapes, dtypes, idx):
    parent_remote.close()
    env = env_fn()
    monitor = _Monitor()
    shms = {k: shared_memory.SharedMemory(name=name) for k, name in shm_names.items()}
    views = {k: np.ndarray(shapes[k], dtype=dtypes[k], buffer=shms[k].buf) for k in shm_names}

    def write_obs(obs):
        for k, v in obs.items():
            views[k][idx] = v

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
                write_obs(o)
                remote.send((r, done, info))
            elif cmd == "reset":
                o, _ = env.reset(seed=data)
                write_obs(o)
                remote.send(True)
            elif cmd == "get_spaces":
                remote.send((env.observation_space, env.action_space))
            elif cmd == "close":
                env.close()
                for s in shms.values():
                    s.close()
                remote.close()
                break
    except (KeyboardInterrupt, EOFError):
        pass


class SharedMemoryVecEnv:
    def __init__(self, env_fns: Sequence[Callable], start_method: str = "fork"):
        ctx = mp.get_context(start_method)
        self.num_envs = len(env_fns)
        probe = env_fns[0]()
        self.observation_space = probe.observation_space
        self.action_space = probe.action_space
        probe.close()

        self._shms = {}
        self._views = {}
        shapes, dtypes, names = {}, {}, {}
        for k, sp in self.observation_space.spaces.items():
            shape = (self.num_envs, *sp.shape)
            nbytes = int(np.prod(shape)) * np.dtype(sp.dtype).itemsize
            shm = shared_memory.SharedMemory(create=True, size=nbytes)
            self._shms[k] = shm
            self._views[k] = np.ndarray(shape, dtype=sp.dtype, buffer=shm.buf)
            shapes[k], dtypes[k], names[k] = shape, sp.dtype, shm.name

        self.remotes, work_remotes = zip(*[ctx.Pipe() for _ in range(self.num_envs)])
        self.processes = []
        for i, (wr, fn) in enumerate(zip(work_remotes, env_fns)):
            p = ctx.Process(target=_worker, args=(wr, self.remotes[i], fn, names, shapes, dtypes, i), daemon=True)
            p.start()
            wr.close()
            self.processes.append(p)

    def reset(self, seed: int | None = None) -> dict:
        for i, r in enumerate(self.remotes):
            r.send(("reset", None if seed is None else seed + i))
        for r in self.remotes:
            r.recv()
        return {k: v.copy() for k, v in self._views.items()}

    def step(self, actions: np.ndarray):
        for r, a in zip(self.remotes, actions):
            r.send(("step", a))
        rewards, dones, infos = [], [], []
        for r in self.remotes:
            rew, done, info = r.recv()
            rewards.append(rew)
            dones.append(done)
            infos.append(info)
        # copy: the views are reused next step (the policy consumes this batch async)
        obs = {k: v.copy() for k, v in self._views.items()}
        return obs, np.asarray(rewards, np.float32), np.asarray(dones, bool), infos

    def env_method(self, name, *args, indices=None, **kwargs):
        raise NotImplementedError("use SubprocVecEnv for env_method")

    def close(self):
        for r in self.remotes:
            try:
                r.send(("close", None))
            except BrokenPipeError:
                pass
        for p in self.processes:
            p.join(timeout=5)
        for shm in self._shms.values():
            shm.close()
            try:
                shm.unlink()
            except FileNotFoundError:
                pass
