"""Actor-critic policy over VTMAE features.

Capability parity with the reference's MAEExtractor + MAEPolicy
(reference: models/pretrain_models.py:788-923):

* features = VTMAE.get_embeddings (full-sequence, no mask) -> one extra
  depth-1 pre-norm transformer -> token mean-pool  (:819-841);
* separate pi/vf MLP towers (Tanh, [256, 256] by default), linear action
  mean + state-independent log_std (init 0), linear value head — the SB3
  ActorCriticPolicy contract the reference subclasses (ortho_init disabled
  as in the reference, :877);
* diagonal Gaussian distribution: sample / log_prob / entropy.

TPU-first: the policy is one nnx module so a *single* jitted function covers
feature extraction + heads; obs packing (vt_load) happens inside the same
graph, fused with the first conv.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..models.vtmae import VTMAE
from ..nn.transformer import Transformer
from ..utils.obs import vt_load

_LOG_2PI = float(np.log(2.0 * np.pi))


class MLP(nnx.Module):
    def __init__(self, in_dim: int, widths: Sequence[int], *, dtype=jnp.float32, rngs: nnx.Rngs):
        dims = [in_dim, *widths]
        self.layers = nnx.List(
            [nnx.Linear(dims[i], dims[i + 1], dtype=dtype, param_dtype=jnp.float32, rngs=rngs) for i in range(len(widths))]
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            x = jnp.tanh(layer(x))
        return x


class MAEFeatures(nnx.Module):
    """VTMAE embeddings -> depth-1 transformer -> mean pool."""

    def __init__(self, mae: VTMAE, dim: int, *, vision_only_control: bool = False, frame_stack: int = 1, dtype=jnp.float32, rngs: nnx.Rngs):
        self.mae = mae
        self.vision_only_control = vision_only_control
        self.frame_stack = frame_stack
        self.post = Transformer(dim, depth=1, heads=4, dim_head=64, mlp_dim=dim * 2, dtype=dtype, rngs=rngs)

    def __call__(self, obs: dict) -> jnp.ndarray:
        return self.from_packed(vt_load(obs, frame_stack=self.frame_stack))

    def from_packed(self, x: dict) -> jnp.ndarray:
        """Features from an already vt_load-packed batch (lets the PPO update
        pack once and share the batch between the MAE loss and the policy)."""
        emb = self.mae.get_embeddings(x, use_tactile=not self.vision_only_control)
        z = self.post(emb)
        return jnp.mean(z, axis=1)

    def mae_loss(self, x: dict, key: jax.Array) -> jnp.ndarray:
        """Representation loss on a packed batch (PPO/SAC interleaved MAE
        update). Variant extractors override the modality selection."""
        return self.mae(x, key)

    def features_and_mae_loss(self, x: dict, key: jax.Array):
        """Policy features AND the MAE loss with ONE shared token pipeline
        (EarlyCNN/patch embed + modality/pos encodings) — the fused PPO
        update's redundant-compute fix. Falls back to separate pipelines in
        vision_only_control mode, where the policy's token set differs from
        the MAE's (reference pretrain_models.py:819-841 vs :146-342)."""
        if self.vision_only_control:
            return self.from_packed(x), self.mae_loss(x, key)
        use_vision = "image" in x
        mae = self.mae
        image_patches, tactile_patches = mae._raw_patches(x, use_vision, True)
        tokens = mae._tokens(x, use_vision, True, image_patches, tactile_patches)
        emb = mae.encoder.transformer(tokens)
        feats = jnp.mean(self.post(emb), axis=1)
        loss = mae(x, key, use_vision=use_vision, precomputed=(tokens, image_patches, tactile_patches))
        return feats, loss


class ActorCritic(nnx.Module):
    def __init__(
        self,
        features: MAEFeatures,
        feat_dim: int,
        action_dim: int,
        *,
        net_arch_pi: Sequence[int] = (256, 256),
        net_arch_vf: Sequence[int] = (256, 256),
        log_std_init: float = 0.0,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.features = features
        self.action_dim = action_dim
        self.pi_mlp = MLP(feat_dim, net_arch_pi, dtype=dtype, rngs=rngs)
        self.vf_mlp = MLP(feat_dim, net_arch_vf, dtype=dtype, rngs=rngs)
        self.action_net = nnx.Linear(net_arch_pi[-1], action_dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.value_net = nnx.Linear(net_arch_vf[-1], 1, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.log_std = nnx.Param(jnp.full((action_dim,), log_std_init, jnp.float32))

    # --- distribution helpers (diagonal Gaussian) --- #
    def _heads(self, feats: jnp.ndarray):
        mean = self.action_net(self.pi_mlp(feats)).astype(jnp.float32)
        value = self.value_net(self.vf_mlp(feats)).astype(jnp.float32)[:, 0]
        return mean, self.log_std[...], value

    def _dist_params(self, obs: dict):
        return self._heads(self.features(obs))

    @staticmethod
    def _log_prob(actions, mean, log_std):
        var = jnp.exp(2.0 * log_std)
        lp = -0.5 * ((actions - mean) ** 2 / var + 2.0 * log_std + _LOG_2PI)
        return jnp.sum(lp, axis=-1)

    @staticmethod
    def _entropy(log_std, batch: int):
        ent = jnp.sum(0.5 + 0.5 * _LOG_2PI + log_std)
        return jnp.broadcast_to(ent, (batch,))

    # --- public API --- #
    def step(self, obs: dict, key: jax.Array, deterministic: bool = False):
        """Sample actions for rollout: (actions, values, log_prob)."""
        mean, log_std, value = self._dist_params(obs)
        if deterministic:
            actions = mean
        else:
            noise = jax.random.normal(key, mean.shape, mean.dtype)
            actions = mean + jnp.exp(log_std) * noise
        return actions, value, self._log_prob(actions, mean, log_std)

    def evaluate_actions(self, obs: dict, actions: jnp.ndarray):
        """(values, log_prob, entropy) for PPO update."""
        mean, log_std, value = self._dist_params(obs)
        return value, self._log_prob(actions, mean, log_std), self._entropy(log_std, mean.shape[0])

    def evaluate_actions_packed(self, x: dict, actions: jnp.ndarray):
        mean, log_std, value = self._heads(self.features.from_packed(x))
        return value, self._log_prob(actions, mean, log_std), self._entropy(log_std, mean.shape[0])

    def evaluate_actions_packed_with_mae(self, x: dict, actions: jnp.ndarray, key: jax.Array):
        """(values, log_prob, entropy, mae_loss) with the token pipeline
        shared between the policy features and the MAE loss when the
        extractor supports it (joint fused PPO+MAE update)."""
        if hasattr(self.features, "features_and_mae_loss"):
            feats, mae_loss = self.features.features_and_mae_loss(x, key)
        else:
            feats = self.features.from_packed(x)
            mae_loss = self.features.mae_loss(x, key)
        mean, log_std, value = self._heads(feats)
        return value, self._log_prob(actions, mean, log_std), self._entropy(log_std, mean.shape[0]), mae_loss

    def predict_values(self, obs: dict) -> jnp.ndarray:
        _, _, value = self._dist_params(obs)
        return value
