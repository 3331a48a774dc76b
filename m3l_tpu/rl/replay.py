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


class DeviceReplayBuffer:
    """HBM-resident ring buffer (TPU-native alternative to :class:`ReplayBuffer`).

    The reference pays a host->device copy of every sampled minibatch per SAC
    gradient step (models/sac_mae.py:240 via SB3 ReplayBuffer.sample; the
    "improved" PPO files hide the same cost behind DataLoader workers). Over
    a network-attached TPU that transfer dominates the whole update. Here the
    ring lives in device HBM (images uint8, float32 maps stored bfloat16),
    ``add`` writes one time slot per dispatch into donated buffers (true
    in-place update under XLA), and ``sample`` gathers the minibatch entirely
    on device — the only host->device traffic per transition is the single
    new observation.

    Timeout (truncated-episode) transitions keep SB3's
    ``handle_timeout_termination`` semantics exactly, like the host buffer:
    their true terminal observation is stored in a small device-side ring of
    ``timeout_capacity`` slots referenced by slot index, and the sample
    gather substitutes it for the ring-successor observation. The timeout
    ring must be large enough that an entry is not overwritten while its
    transition is still sampleable: timeout_capacity >= capacity * n_envs /
    min_episode_length.

    Storage layout is tile-aware: each obs key is kept as
    ``(capacity, n_envs, prod(shape))`` — flat trailing dim — and reshaped to
    the true obs shape only after the minibatch gather. TPU HBM tiles the two
    minor dimensions to (8, 128) sublanes x lanes, so a ring stored at its
    natural shape (e.g. bf16 tactile ``(cap, E, 2, 6, 32, 32)``) pays a 4x
    padding expansion (last dim 32 -> 128) plus layout-change copies inside
    any jitted consumer — measured 28 GB program HBM for a 3.4 GB ring. The
    flat layout's minor dims (n_envs, 12288) tile exactly, so the ring costs
    its unpadded size and gathers consume it in place.
    """

    def __init__(self, capacity: int, n_envs: int, obs_space, action_dim: int, timeout_capacity: int = 4096):
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        self.capacity = max(capacity // n_envs, 1)
        self.n_envs = n_envs
        self._obs_dtypes = {}
        self._obs_shapes = {}
        store_map = {np.dtype(np.float32): jnp.bfloat16, np.dtype(np.float16): jnp.bfloat16}
        obs = {}
        tobs = {}
        for k, sp in obs_space.spaces.items():
            store = store_map.get(np.dtype(sp.dtype), sp.dtype)
            flat = int(np.prod(sp.shape))
            obs[k] = jnp.zeros((self.capacity, n_envs, flat), store)
            tobs[k] = jnp.zeros((timeout_capacity, flat), store)
            self._obs_dtypes[k] = sp.dtype
            self._obs_shapes[k] = tuple(sp.shape)
        self._state = {
            "obs": obs,
            "actions": jnp.zeros((self.capacity, n_envs, action_dim), jnp.float32),
            "rewards": jnp.zeros((self.capacity, n_envs), jnp.float32),
            "dones": jnp.zeros((self.capacity, n_envs), jnp.float32),
            "timeouts": jnp.zeros((self.capacity, n_envs), jnp.float32),
            "timeout_obs": tobs,
            "timeout_slot": jnp.full((self.capacity, n_envs), -1, jnp.int32),
        }
        self.timeout_capacity = timeout_capacity
        self._timeout_pos = 0
        # host-side guard against timeout-ring wraparound clobbering a slot
        # whose transition is still sampleable (ADVICE r2): records the global
        # write count at each slot's last allocation
        self._slot_alloc_write = np.full(timeout_capacity, np.iinfo(np.int64).min, np.int64)
        self._write_count = 0
        self.pos = 0
        self.full = False

        def _write(state, p, obs_in, actions, rewards, dones, timeouts, slot_row):
            new = dict(state)
            new["obs"] = {
                k: state["obs"][k]
                .at[p]
                .set(obs_in[k].reshape(self.n_envs, -1).astype(state["obs"][k].dtype))
                for k in obs_in
            }
            new["actions"] = state["actions"].at[p].set(actions)
            new["rewards"] = state["rewards"].at[p].set(rewards)
            new["dones"] = state["dones"].at[p].set(dones)
            new["timeouts"] = state["timeouts"].at[p].set(timeouts)
            new["timeout_slot"] = state["timeout_slot"].at[p].set(slot_row)
            return new

        def _write_timeout(state, tpos, term_obs):
            new = dict(state)
            new["timeout_obs"] = {
                k: state["timeout_obs"][k]
                .at[tpos]
                .set(term_obs[k].reshape(-1).astype(state["timeout_obs"][k].dtype))
                for k in term_obs
            }
            return new

        cap = self.capacity

        def _gather(state, idx, env_idx):
            nxt = (idx + 1) % cap
            def fetch(rows):
                return {k: state["obs"][k][rows, env_idx] for k in state["obs"]}
            obs_b = fetch(idx)
            next_b = fetch(nxt)
            slot = state["timeout_slot"][idx, env_idx]
            use_t = slot >= 0
            safe = jnp.maximum(slot, 0)
            out_next = {}
            for k in next_b:
                t = state["timeout_obs"][k][safe]
                sel = use_t.reshape((-1,) + (1,) * (t.ndim - 1))
                out_next[k] = jnp.where(sel, t, next_b[k])
            dones = state["dones"][idx, env_idx] * (1.0 - state["timeouts"][idx, env_idx])
            def cast(d):
                out = {}
                for k, v in d.items():
                    v = v.reshape((v.shape[0],) + self._obs_shapes[k])
                    out[k] = v.astype(self._obs_dtypes[k]) if v.dtype == jnp.bfloat16 else v
                return out
            return {
                "obs": cast(obs_b),
                "next_obs": cast(out_next),
                "actions": state["actions"][idx, env_idx],
                "rewards": state["rewards"][idx, env_idx],
                "dones": dones,
            }

        # donation keeps the multi-GB ring update in place instead of copying
        self._write = jax.jit(_write, donate_argnums=0)
        self._write_timeout = jax.jit(_write_timeout, donate_argnums=0)
        self._gather = jax.jit(_gather)
        # un-jitted gather for callers that fuse sampling into a larger jitted
        # step (SACMAE's multi-gradient-step scan gathers inside its own jit)
        self._gather_fn = _gather

    def __len__(self):
        return (self.capacity if self.full else self.pos) * self.n_envs

    # numpy views for checkpointing (CheckpointCallback np.savez duck-typing)
    @property
    def actions(self):
        return np.asarray(self._state["actions"])

    @property
    def rewards(self):
        return np.asarray(self._state["rewards"])

    @property
    def dones(self):
        return np.asarray(self._state["dones"])

    @property
    def timeouts(self):
        return np.asarray(self._state["timeouts"])

    @property
    def obs(self):
        # bf16 storage is cast to float32 for the numpy view: np.load reads a
        # saved ml_dtypes bfloat16 array back as opaque void16, so checkpoints
        # must carry a self-describing dtype. float32 is LOSSLESS from bf16;
        # the float16 view used previously saturates to inf above 65504,
        # silently corrupting any unnormalized obs channel (ADVICE r3).
        def view(v):
            a = np.asarray(v)
            if a.dtype.names is None and a.dtype.kind not in "fiu":  # ml_dtypes bf16
                a = a.astype(np.float32)
            elif str(a.dtype) == "bfloat16":
                a = a.astype(np.float32)
            return a

        return {
            k: view(v).reshape((self.capacity, self.n_envs) + self._obs_shapes[k])
            for k, v in self._state["obs"].items()
        }

    def add(self, obs: dict, actions, rewards, dones, infos) -> None:
        jnp = self._jnp
        p = self.pos
        slot_row = np.full((self.n_envs,), -1, np.int32)
        for e, info in enumerate(infos):
            if bool(info.get("TimeLimit.truncated", False)) and "terminal_observation" in info:
                tpos = self._timeout_pos
                self._timeout_pos = (tpos + 1) % self.timeout_capacity
                # the previous tenant of this slot is still sampleable if the
                # main ring has not wrapped past its referencing row yet
                # (int64.min marks a never-allocated slot; compare in Python
                # ints — numpy int64 subtraction would wrap negative)
                prev_alloc = int(self._slot_alloc_write[tpos])
                if prev_alloc != np.iinfo(np.int64).min and self._write_count - prev_alloc < self.capacity:
                    import warnings

                    warnings.warn(
                        f"DeviceReplayBuffer timeout ring wrapped after {self._write_count - self._slot_alloc_write[tpos]} "
                        f"writes (< capacity {self.capacity}): a live truncated transition's next_obs is being "
                        f"overwritten. Raise timeout_capacity (currently {self.timeout_capacity}).",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                self._slot_alloc_write[tpos] = self._write_count
                slot_row[e] = tpos
                self._state = self._write_timeout(
                    self._state, jnp.int32(tpos), {k: jnp.asarray(v) for k, v in info["terminal_observation"].items()}
                )
        self._state = self._write(
            self._state,
            jnp.int32(p),
            {k: jnp.asarray(v) for k, v in obs.items()},
            jnp.asarray(actions, jnp.float32),
            jnp.asarray(rewards, jnp.float32),
            jnp.asarray(np.asarray(dones), jnp.float32),
            jnp.asarray(np.array([float(i.get("TimeLimit.truncated", False)) for i in infos], np.float32)),
            jnp.asarray(slot_row),
        )
        self.pos += 1
        self._write_count += 1
        if self.pos == self.capacity:
            self.full = True
            self.pos = 0

    def sample_indices(self, batch_size: int, rng: np.random.Generator):
        """Draw valid (time-slot, env) sample indices without gathering."""
        if self.full:
            idx = (rng.integers(0, self.capacity - 1, batch_size) + self.pos) % self.capacity
        else:
            if self.pos < 2:
                raise ValueError("DeviceReplayBuffer.sample needs at least two written time slots")
            idx = rng.integers(0, self.pos - 1, batch_size)
        env_idx = rng.integers(0, self.n_envs, batch_size)
        return idx, env_idx

    def sample(self, batch_size: int, rng: np.random.Generator) -> dict:
        idx, env_idx = self.sample_indices(batch_size, rng)
        return self._gather(self._state, self._jnp.asarray(idx, self._jnp.int32), self._jnp.asarray(env_idx, self._jnp.int32))
