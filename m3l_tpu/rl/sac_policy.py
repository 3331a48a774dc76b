"""SAC actor-critic over shared VTMAE features.

Capability parity with the reference's MAESACPolicy (reference:
models/sac_mae_policy.py:18-118, a thin SB3 SACPolicy with the MAEExtractor),
with SB3's SAC architecture contract:

* Actor: features -> MLP[256, 256] (ReLU) -> (mu, log_std) heads; squashed
  diagonal Gaussian (tanh), log_std clamped to [-20, 2], tanh log-prob
  correction with eps 1e-6.
* Critic: n_critics=2 independent Q-MLPs over concat(features, action),
  [256, 256] ReLU; a polyak-averaged target copy.
* Feature extractor shared between actor and critic; the critic update does
  not move the extractor (SB3 excludes shared extractor params from the
  critic optimizer) — expressed here with an explicit stop_gradient.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .policy import MAEFeatures

_LOG_2PI = float(np.log(2.0 * np.pi))
LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class _ReluMLP(nnx.Module):
    def __init__(self, in_dim: int, widths: Sequence[int], *, dtype=jnp.float32, rngs: nnx.Rngs):
        dims = [in_dim, *widths]
        self.layers = nnx.List(
            [nnx.Linear(dims[i], dims[i + 1], dtype=dtype, param_dtype=jnp.float32, rngs=rngs) for i in range(len(widths))]
        )

    def __call__(self, x):
        for layer in self.layers:
            x = nnx.relu(layer(x))
        return x


class Actor(nnx.Module):
    def __init__(self, feat_dim: int, action_dim: int, net_arch=(256, 256), *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.latent = _ReluMLP(feat_dim, net_arch, dtype=dtype, rngs=rngs)
        self.mu = nnx.Linear(net_arch[-1], action_dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.log_std = nnx.Linear(net_arch[-1], action_dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def dist(self, feats):
        h = self.latent(feats)
        mean = self.mu(h).astype(jnp.float32)
        log_std = jnp.clip(self.log_std(h).astype(jnp.float32), LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std

    def action_log_prob(self, feats, key):
        mean, log_std = self.dist(feats)
        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape, jnp.float32)
        u = mean + std * noise
        a = jnp.tanh(u)
        logp = -0.5 * ((u - mean) ** 2 / std**2 + 2.0 * log_std + _LOG_2PI)
        logp = jnp.sum(logp, axis=-1) - jnp.sum(jnp.log(1.0 - a**2 + 1e-6), axis=-1)
        return a, logp

    def deterministic_action(self, feats):
        mean, _ = self.dist(feats)
        return jnp.tanh(mean)


class QNet(nnx.Module):
    def __init__(self, feat_dim: int, action_dim: int, net_arch=(256, 256), *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.mlp = _ReluMLP(feat_dim + action_dim, net_arch, dtype=dtype, rngs=rngs)
        self.head = nnx.Linear(net_arch[-1], 1, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, feats, actions):
        x = jnp.concatenate([feats, actions.astype(feats.dtype)], axis=-1)
        return self.head(self.mlp(x)).astype(jnp.float32)[:, 0]


class Critic(nnx.Module):
    def __init__(self, feat_dim: int, action_dim: int, n_critics: int = 2, net_arch=(256, 256), *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.qs = nnx.List([QNet(feat_dim, action_dim, net_arch, dtype=dtype, rngs=rngs) for _ in range(n_critics)])

    def __call__(self, feats, actions):
        return jnp.stack([q(feats, actions) for q in self.qs], axis=-1)  # (B, n_critics)


class SACActorCritic(nnx.Module):
    """Shared-extractor SAC policy: features + actor + critic + target critic."""

    def __init__(self, features: MAEFeatures, feat_dim: int, action_dim: int, *, net_arch_pi=(256, 256), net_arch_qf=(256, 256), n_critics: int = 2, dtype=jnp.float32, rngs: nnx.Rngs):
        self.features = features
        self.actor = Actor(feat_dim, action_dim, net_arch_pi, dtype=dtype, rngs=rngs)
        self.critic = Critic(feat_dim, action_dim, n_critics, net_arch_qf, dtype=dtype, rngs=rngs)
        self.critic_target = Critic(feat_dim, action_dim, n_critics, net_arch_qf, dtype=dtype, rngs=rngs)
        self.log_ent_coef = nnx.Param(jnp.zeros((), jnp.float32))  # exp(0) = 1.0 init

    def sample_action(self, obs: dict, key):
        return self.actor.action_log_prob(self.features(obs), key)

    def predict(self, obs: dict):
        return self.actor.deterministic_action(self.features(obs))
