"""SAC with interleaved MAE representation learning (off-policy M3L).

Capability parity with the reference SAC_MAE (reference:
models/sac_mae.py:95-382), re-architected for TPU: the whole gradient step —
MAE update on replay observations, entropy-coefficient update, twin-critic
TD update, actor update against the refreshed critic, polyak target move —
is ONE jitted function with donated states, preserving the reference's exact
update ordering:

1. MAE update(s) on the sampled observations (separate Adam(1e-4) by default,
   reference :266-291; ``separate_optimizer=False`` folds the MAE loss into
   the actor update — the reference's joint branch references a non-existent
   ``policy.optimizer`` and would crash, so the evident intent is
   implemented);
2. ent_coef read BEFORE its own update (reference :311);
3. ent-coef Adam step on -(log_alpha * stop_grad(logp + target_entropy));
4. critic MSE to min-twin target (grads do NOT reach the shared extractor —
   SB3 excludes it from the critic optimizer);
5. actor update vs the UPDATED critic (reference :354 uses post-step critic).
   Joint mode: actor Adam covers actor heads + shared extractor (incl. the
   MAE encoder). Separate mode: the actor consumes stop-gradient features —
   the MAE optimizer owns the representation (see the deviation note at the
   actor update in the code);
6. polyak(critic -> target, tau).

Practitioner note — ``norm_reward`` (default True for flag parity with
reference Train_sacmae.py:58,137): running-return reward normalization is
sound for on-policy PPO but interacts badly with a replay buffer, because
each transition stores the reward scaled by the normalizer's σ *at
collection time*. Early transitions (tiny σ, rewards clipped at ±10) then
coexist in the buffer with late ones (σ grown 100×), and the critic
bootstraps on a reward scale that varies by orders of magnitude across the
batch — measured on FakeInsertion as persistent Q overestimation (~+8 in
normalized units vs a true value ≈ −1) and a flat learning curve. Pass
``norm_reward=False`` for SAC; the recorded converging curve in BASELINE.md
uses raw rewards.
"""
from __future__ import annotations

import time
from collections import deque
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from ..utils.obs import vt_load
from .replay import DeviceReplayBuffer, ReplayBuffer
from .sac_policy import SACActorCritic
from .vecnorm import RewardNormalizer


class SACMAE:
    def __init__(
        self,
        policy: SACActorCritic,
        env,
        *,
        learning_rate: float = 3e-4,
        buffer_size: int = 1_000_000,
        learning_starts: int = 100,
        batch_size: int = 256,
        tau: float = 0.005,
        gamma: float = 0.99,
        train_freq: int = 1,
        gradient_steps: int = 1,
        ent_coef: str | float = "auto",
        target_update_interval: int = 1,
        target_entropy: str | float = "auto",
        mae_batch_size: int = 256,
        separate_optimizer: bool = True,
        mae_lr: float = 1e-4,
        norm_reward: bool = True,
        frame_stack: int = 1,
        device_buffer: bool = False,
        timeout_capacity: int = 4096,
        seed: int = 0,
        verbose: int = 0,
        mesh=None,
    ):
        self.env = env
        self.n_envs = env.num_envs
        self.learning_starts = learning_starts
        self.batch_size = batch_size
        self.tau = tau
        self.gamma = gamma
        self.train_freq = train_freq
        self.gradient_steps = gradient_steps
        self.target_update_interval = target_update_interval
        self.mae_batch_size = min(mae_batch_size, batch_size)
        self.separate_optimizer = separate_optimizer
        self.frame_stack = frame_stack
        self.verbose = verbose

        action_dim = env.action_space.shape[0]
        if target_entropy == "auto":
            self.target_entropy = float(-action_dim)
        else:
            self.target_entropy = float(target_entropy)
        self.auto_ent = isinstance(ent_coef, str) and ent_coef.startswith("auto")
        if self.auto_ent:
            init = 1.0
            if "_" in str(ent_coef):
                init = float(str(ent_coef).split("_")[1])
            self._init_log_ent = float(np.log(init))
        else:
            self.fixed_ent_coef = float(ent_coef)

        # --- parameter groups --- #
        f_mae = nnx.All(nnx.Param, nnx.PathContains("mae"))
        f_target = nnx.All(nnx.Param, nnx.PathContains("critic_target"))
        f_critic = nnx.All(nnx.Param, nnx.PathContains("critic"))
        f_ent = nnx.All(nnx.Param, nnx.PathContains("log_ent_coef"))
        (self._graphdef, self.mae_params, self.target_params, self.critic_params, self.ent_params, self.actor_params, self._rest) = nnx.split(
            policy, f_mae, f_target, f_critic, f_ent, nnx.Param, ...
        )
        if self.auto_ent:
            self.ent_params = jax.tree.map(lambda x: jnp.full_like(x, self._init_log_ent), self.ent_params)
        # target starts as a copy of the online critic
        self.target_params = jax.tree.map(lambda c: c.copy(), _clone_renamed(self.critic_params, self.target_params))
        self.mesh = mesh
        if mesh is not None:
            # GSPMD placement: mp-rule kernels sharded, everything else
            # replicated; batches dp-sharded at train_step (mirrors PPOMAE)
            from ..train.mesh import shard_param_state

            (self.mae_params, self.target_params, self.critic_params, self.ent_params, self.actor_params) = (
                shard_param_state(p, mesh)
                for p in (self.mae_params, self.target_params, self.critic_params, self.ent_params, self.actor_params)
            )

        if mesh is None:
            # flat-buffer fused Adam (train/optim.py; single-chip/dp only —
            # raveling mp-sharded params would force an all-gather)
            from ..train.optim import flat_adam as _adam
        else:
            _adam = optax.adam
        self._actor_tx = _adam(learning_rate)
        self._critic_tx = _adam(learning_rate)
        self._ent_tx = _adam(learning_rate)
        self._mae_tx = _adam(mae_lr)
        self.actor_opt = self._actor_tx.init((self.actor_params, self.mae_params))
        self.critic_opt = self._critic_tx.init(self.critic_params)
        self.ent_opt = self._ent_tx.init(self.ent_params)
        self.mae_opt = self._mae_tx.init(self.mae_params) if separate_optimizer else ()

        if device_buffer:
            self.buffer = DeviceReplayBuffer(
                buffer_size, self.n_envs, env.observation_space, action_dim, timeout_capacity=timeout_capacity
            )
        else:
            self.buffer = ReplayBuffer(buffer_size, self.n_envs, env.observation_space, action_dim)
        self.reward_normalizer = RewardNormalizer(self.n_envs, gamma=gamma, enabled=norm_reward)
        self._action_low = env.action_space.low
        self._action_high = env.action_space.high

        self.num_timesteps = 0
        self._n_updates = 0
        self.ep_info_buffer: deque = deque(maxlen=100)
        self._key = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)
        self._last_obs = None
        self.last_metrics: dict = {}
        self._build_jits()

    # ------------------------------------------------------------------ #
    def _build_jits(self):
        graphdef, rest = self._graphdef, self._rest
        frame_stack = self.frame_stack
        gamma, tau = self.gamma, self.tau
        target_entropy = self.target_entropy
        auto_ent = self.auto_ent
        fixed_ent = None if auto_ent else self.fixed_ent_coef
        separate = self.separate_optimizer
        mae_bs, batch_size = self.mae_batch_size, self.batch_size
        actor_tx, critic_tx, ent_tx, mae_tx = self._actor_tx, self._critic_tx, self._ent_tx, self._mae_tx

        def merge(mae_p, tgt_p, crit_p, ent_p, actor_p):
            return nnx.merge(graphdef, mae_p, tgt_p, crit_p, ent_p, actor_p, rest)

        @jax.jit
        def sample_action(states, obs, key):
            model = merge(*states)
            a, _ = model.sample_action(obs, key)
            return a

        @jax.jit
        def predict_action(states, obs):
            model = merge(*states)
            return model.predict(obs)

        self._sample_action = sample_action
        self._predict_action = predict_action

        def update_body(carry, batch, key):
            mae_p, tgt_p, crit_p, ent_p, actor_p, actor_opt, critic_opt, ent_opt, mae_opt = carry
            x = vt_load(batch["obs"], frame_stack=frame_stack)
            x_next = vt_load(batch["next_obs"], frame_stack=frame_stack)
            k_mae, k_pi, k_next = jax.random.split(key, 3)
            metrics = {}

            # 1) MAE update(s) on replay observations
            if separate:
                n_iter = max(batch_size // mae_bs, 1)
                chunked = jax.tree.map(lambda v: v[: n_iter * mae_bs].reshape(n_iter, mae_bs, *v.shape[1:]), x)
                mae_keys = jax.random.split(k_mae, n_iter)

                def mae_step(c, cxs):
                    mp, mopt = c
                    x_chunk, kk = cxs
                    ml, mg = jax.value_and_grad(
                        lambda mp_: merge(mp_, tgt_p, crit_p, ent_p, actor_p).features.mae_loss(x_chunk, kk)
                    )(mp)
                    upd, mopt = mae_tx.update(mg, mopt, mp)
                    return (optax.apply_updates(mp, upd), mopt), ml

                (mae_p, mae_opt), mls = jax.lax.scan(mae_step, (mae_p, mae_opt), (chunked, mae_keys))
                metrics["mae_loss"] = mls[-1]

            # 2) current-policy action + log-prob (post-MAE-update params)
            def actor_fwd(actor_p_, mae_p_, packed, kk):
                model = merge(mae_p_, tgt_p, crit_p, ent_p, actor_p_)
                feats = model.features.from_packed(packed)
                return model.actor.action_log_prob(feats, kk), feats

            (actions_pi, log_prob), _ = actor_fwd(actor_p, mae_p, x, k_pi)

            # 3) entropy coefficient (value read BEFORE its update)
            if auto_ent:
                ent_coef = jnp.exp(_leaf(ent_p))
                ent_grad = jax.grad(
                    lambda ep: -jnp.mean(_leaf(ep) * jax.lax.stop_gradient(log_prob + target_entropy))
                )(ent_p)
                upd, ent_opt = ent_tx.update(ent_grad, ent_opt, ent_p)
                ent_p = optax.apply_updates(ent_p, upd)
                metrics["ent_coef_loss"] = -jnp.mean(jnp.log(ent_coef) * jax.lax.stop_gradient(log_prob + target_entropy))
            else:
                ent_coef = jnp.asarray(fixed_ent)
            metrics["ent_coef"] = ent_coef

            # 4) critic update (no gradient into the shared extractor)
            model_now = merge(mae_p, tgt_p, crit_p, ent_p, actor_p)
            (next_actions, next_logp), next_feats_unused = actor_fwd(actor_p, mae_p, x_next, k_next)
            next_feats = jax.lax.stop_gradient(model_now.features.from_packed(x_next))
            next_q = model_now.critic_target(next_feats, next_actions)
            next_q = jnp.min(next_q, axis=-1) - ent_coef * next_logp
            target_q = jax.lax.stop_gradient(batch["rewards"] + (1.0 - batch["dones"]) * gamma * next_q)
            feats_sg = jax.lax.stop_gradient(model_now.features.from_packed(x))

            def critic_loss_fn(cp):
                q = merge(mae_p, tgt_p, cp, ent_p, actor_p).critic(feats_sg, batch["actions"])
                return 0.5 * jnp.sum(jnp.mean((q - target_q[:, None]) ** 2, axis=0))

            critic_loss, cgrad = jax.value_and_grad(critic_loss_fn)(crit_p)
            upd, critic_opt = critic_tx.update(cgrad, critic_opt, crit_p)
            crit_p = optax.apply_updates(crit_p, upd)
            metrics["critic_loss"] = critic_loss

            # 5) actor update against the refreshed critic. Joint mode: Adam
            #    covers actor heads + shared extractor + MAE loss (reference
            #    intent). Separate mode: the MAE optimizer owns the
            #    representation OUTRIGHT — the actor consumes stop-gradient
            #    features. Deviation from SB3's shared-extractor default
            #    (actor optimizer includes the extractor), adopted because
            #    the Q-maximizing gradient through the encoder lets the actor
            #    inflate Q by warping the features the critic evaluates on:
            #    measured on FakeInsertion as unbounded positive Q drift
            #    (actor_loss -> -195 vs a +45 feasible ceiling) with a flat
            #    return curve. SB3's own docs recommend
            #    share_features_extractor=False for SAC for the same reason;
            #    stop-gradient is the fused-update equivalent.
            def actor_loss_fn(params):
                ap, mp = params
                model = merge(mp, tgt_p, crit_p, ent_p, ap)
                feats = feats_sg if separate else model.features.from_packed(x)
                a, logp = model.actor.action_log_prob(feats, k_pi)
                q_pi = jnp.min(model.critic(feats, a), axis=-1)
                loss = jnp.mean(ent_coef * logp - q_pi)
                if not separate:
                    mloss = model.features.mae_loss(x, k_mae)
                    return loss + mloss, (loss, mloss)
                return loss, (loss, jnp.zeros(()))

            (_, (actor_loss, joint_mae_loss)), agrad = jax.value_and_grad(actor_loss_fn, has_aux=True)((actor_p, mae_p))
            upd, actor_opt = actor_tx.update(agrad, actor_opt, (actor_p, mae_p))
            actor_p, mae_p = optax.apply_updates((actor_p, mae_p), upd)
            metrics["actor_loss"] = actor_loss
            if not separate:
                metrics["mae_loss"] = joint_mae_loss

            # 6) polyak target update
            tgt_p = _polyak(crit_p, tgt_p, tau)
            return (mae_p, tgt_p, crit_p, ent_p, actor_p, actor_opt, critic_opt, ent_opt, mae_opt), metrics

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
        def update_step(mae_p, tgt_p, crit_p, ent_p, actor_p, actor_opt, critic_opt, ent_opt, mae_opt, batch, key):
            carry, metrics = update_body(
                (mae_p, tgt_p, crit_p, ent_p, actor_p, actor_opt, critic_opt, ent_opt, mae_opt), batch, key
            )
            return (*carry, metrics)

        self._update_step = update_step

        # Fused multi-gradient-step path (HBM replay ring only): one relay
        # dispatch runs G full SAC updates, sampling each minibatch on device.
        # The reference pays a host->device batch copy + kernel launch train
        # per gradient step (models/sac_mae.py:240); over a network-attached
        # TPU the per-dispatch RTT (~34 ms) would dominate, so the scan is
        # what makes off-policy update ratios >= 1 practical here.
        gather_fn = getattr(self.buffer, "_gather_fn", None)
        if gather_fn is not None:
            @partial(jax.jit, donate_argnums=(0,))
            def multi_update(carry, buf_state, idx, env_idx, keys):
                def step(c, xs):
                    i, e, k = xs
                    return update_body(c, gather_fn(buf_state, i, e), k)

                carry, ms = jax.lax.scan(step, carry, (idx, env_idx, keys))
                return carry, jax.tree.map(lambda m: m[-1], ms)

            self._multi_update = multi_update
        else:
            self._multi_update = None

    # ------------------------------------------------------------------ #
    @property
    def _states(self):
        return (self.mae_params, self.target_params, self.critic_params, self.ent_params, self.actor_params)

    @property
    def policy(self):
        """Reassembled SACActorCritic module (mirrors PPOMAE.policy)."""
        return nnx.merge(self._graphdef, *self._states, self._rest)

    def _act(self, obs) -> np.ndarray:
        if self.num_timesteps < self.learning_starts:
            return np.stack([self.env.action_space.sample() for _ in range(self.n_envs)])
        self._key, k = jax.random.split(self._key)
        a = np.asarray(self._sample_action(self._states, obs, k))
        return np.clip(a, self._action_low, self._action_high)

    def learn(self, total_timesteps: int, callback=None, log_interval: int = 4):
        t_start = time.time()
        if self._last_obs is None:
            self._last_obs = self.env.reset()
        episode_num = 0
        while self.num_timesteps < total_timesteps:
            actions = self._act(self._last_obs)
            new_obs, rewards, dones, infos = self.env.step(actions)
            self.num_timesteps += self.n_envs
            rewards = self.reward_normalizer(rewards, dones)
            for info in infos:
                if "episode" in info:
                    self.ep_info_buffer.append(info["episode"])
                    episode_num += 1
            self.buffer.add(self._last_obs, actions, rewards, dones, infos)
            self._last_obs = new_obs

            if self.num_timesteps >= self.learning_starts and self.num_timesteps % self.train_freq == 0:
                self.last_metrics = self.train_steps(self.gradient_steps)
            if callback is not None and callback(self) is False:
                break
            if self.verbose and episode_num and episode_num % log_interval == 0 and any("episode" in i for i in infos):
                ep_rew = np.mean([e["r"] for e in self.ep_info_buffer])
                ep_suc = np.mean([e.get("s", 0.0) for e in self.ep_info_buffer])
                fps = int(self.num_timesteps / (time.time() - t_start))
                print(
                    f"[sac] steps={self.num_timesteps} fps={fps} ep_rew_mean={ep_rew:.2f} success_rate={ep_suc:.2f} "
                    + " ".join(f"{k}={v:.4f}" for k, v in self.last_metrics.items())
                )
        return self

    def train_steps(self, n: int) -> dict:
        """Run ``n`` gradient steps; fused into one dispatch on a device buffer."""
        if self._multi_update is None:
            metrics = self.last_metrics
            for _ in range(n):
                metrics = self.train_step()
            return metrics
        buf = self.buffer
        if len(buf) < self.batch_size or (not buf.full and buf.pos < 2):
            return self.last_metrics
        idx, env_idx = buf.sample_indices(n * self.batch_size, self._np_rng)
        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, n)
        carry = (self.mae_params, self.target_params, self.critic_params, self.ent_params, self.actor_params,
                 self.actor_opt, self.critic_opt, self.ent_opt, self.mae_opt)
        carry, metrics = self._multi_update(
            carry,
            buf._state,
            jnp.asarray(idx.reshape(n, self.batch_size), jnp.int32),
            jnp.asarray(env_idx.reshape(n, self.batch_size), jnp.int32),
            keys,
        )
        (self.mae_params, self.target_params, self.critic_params, self.ent_params, self.actor_params,
         self.actor_opt, self.critic_opt, self.ent_opt, self.mae_opt) = carry
        self._n_updates += n
        return {k_: float(v) for k_, v in metrics.items()}

    def train_step(self) -> dict:
        if len(self.buffer) < self.batch_size or (not self.buffer.full and self.buffer.pos < 2):
            return self.last_metrics
        batch = self.buffer.sample(self.batch_size, self._np_rng)
        if self.mesh is not None:
            from ..train.mesh import put_batch

            batch = put_batch(batch, self.mesh)
        self._key, k = jax.random.split(self._key)
        out = self._update_step(
            self.mae_params,
            self.target_params,
            self.critic_params,
            self.ent_params,
            self.actor_params,
            self.actor_opt,
            self.critic_opt,
            self.ent_opt,
            self.mae_opt,
            jax.device_put(batch),
            k,
        )
        (self.mae_params, self.target_params, self.critic_params, self.ent_params, self.actor_params,
         self.actor_opt, self.critic_opt, self.ent_opt, self.mae_opt, metrics) = out
        self._n_updates += 1
        return {k_: float(v) for k_, v in metrics.items()}

    def state_dict(self) -> dict:
        return {
            "mae_params": self.mae_params,
            "target_params": self.target_params,
            "critic_params": self.critic_params,
            "ent_params": self.ent_params,
            "actor_params": self.actor_params,
            "actor_opt": self.actor_opt,
            "critic_opt": self.critic_opt,
            "ent_opt": self.ent_opt,
            "mae_opt": self.mae_opt,
            "reward_normalizer": self.reward_normalizer.state_dict(),
            "num_timesteps": self.num_timesteps,
        }

    def save(self, path: str) -> None:
        import pickle

        from ..train.checkpoint import save_checkpoint

        sd = self.state_dict()
        save_checkpoint(path, {k: v for k, v in sd.items() if k != "reward_normalizer"})
        with open(path + ".vecnorm.pkl", "wb") as f:
            pickle.dump(sd["reward_normalizer"], f)

    def load(self, path: str) -> None:
        import os
        import pickle

        from ..train.checkpoint import load_checkpoint, restore_like

        payload = load_checkpoint(path)

        for name in ("mae_params", "target_params", "critic_params", "ent_params", "actor_params", "actor_opt", "critic_opt", "ent_opt"):
            setattr(self, name, restore_like(getattr(self, name), payload[name]))
        if payload.get("mae_opt") is not None and self.mae_opt != ():
            self.mae_opt = restore_like(self.mae_opt, payload["mae_opt"])
        self.num_timesteps = int(payload["num_timesteps"])
        vn = path + ".vecnorm.pkl"
        if os.path.isfile(vn):
            with open(vn, "rb") as f:
                self.reward_normalizer.load_state_dict(pickle.load(f))

    def predict(self, obs: dict, deterministic: bool = True) -> np.ndarray:
        if deterministic:
            a = np.asarray(self._predict_action(self._states, obs))
        else:
            self._key, k = jax.random.split(self._key)
            a = np.asarray(self._sample_action(self._states, obs, k))
        return np.clip(a, self._action_low, self._action_high)


def _leaf(state):
    leaves = jax.tree.leaves(state)
    assert len(leaves) == 1
    return leaves[0]


def _polyak(online, target, tau: float):
    online_flat = {_strip(k): v for k, v in _flat_items(online)}

    def move(path, tval):
        key = _strip(path).replace("critic_target", "critic")
        ov = online_flat[key]
        return (1.0 - tau) * tval + tau * ov

    from flax import nnx

    items = []
    for path, var in nnx.to_flat_state(target):
        val = var.get_value() if hasattr(var, "get_value") else var
        new = move("/".join(map(str, path)), val)
        items.append((path, var.replace(new) if hasattr(var, "replace") else new))
    return nnx.from_flat_state(items)


def _flat_items(state):
    from flax import nnx

    out = []
    for path, var in nnx.to_flat_state(state):
        val = var.get_value() if hasattr(var, "get_value") else var
        out.append(("/".join(map(str, path)), val))
    return out


def _strip(path: str) -> str:
    return path.replace("critic_target", "critic")


def _clone_renamed(critic_state, target_state):
    """Build a target state whose values copy the online critic's."""
    from flax import nnx

    online = {p.replace("critic", "", 1): v for p, v in _flat_items(critic_state)}
    items = []
    for path, var in nnx.to_flat_state(target_state):
        key = "/".join(map(str, path)).replace("critic_target", "", 1)
        val = online[key]
        items.append((path, var.replace(val) if hasattr(var, "replace") else val))
    return nnx.from_flat_state(items)
