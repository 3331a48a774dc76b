"""V-JEPA: latent prediction for 2-frame tactile "video" with tube masks.

Capability parity with the reference VJEPAModule
(reference tactile_ssl/algorithm/vjepa.py:60-380): 3-D tubelet encoder +
predictor (MultiMask wrappers :75-78), tube masks from the MaskCollator
(tactile_ssl/utils/masking.py:58-245), |z-h|^p / p prediction loss averaged
over predictor masks (:176-185), variance regularizer
mean(relu(1 - std-over-patches)) scaled by reg_coeff (:187-189,310-315),
EMA target encoder with momentum ramp (:320-338).

TPU form: tube masks have a static keep count (ssl/masks.py
random_tube_masks), so context/target token selection is a fixed-shape
gather and the whole step is one compiled program.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.vit import VisionTransformer, VisionTransformerPredictor
from .dino import _layer_norm
from .ema import ema_update
from .masks import random_tube_masks
from .module import as_float_image, SSLModule
from .schedulers import linear_schedule


def _mask_to_indices(keep_mask: jnp.ndarray, count: int) -> jnp.ndarray:
    """(B, N) bool with exactly `count` True per row -> (B, count) indices."""
    n = keep_mask.shape[-1]
    order = jnp.argsort(~keep_mask, axis=-1, stable=True)  # True rows first
    return order[:, :count]


class VJEPAModule(SSLModule):
    trainable_filter = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("target_encoder")))

    def __init__(
        self,
        encoder: VisionTransformer,
        predictor: VisionTransformerPredictor,
        *,
        mask_ratio: float = 0.75,
        num_masks: int = 1,
        loss_exp: float = 1.0,
        reg_coeff: float = 0.25,
        moving_average_decay: Union[float, Tuple[float, float]] = 0.998,
        base_lr: float = 1e-4,
        weight_decay: float = 0.04,
        warmup_epochs: int = 10,
        rngs: nnx.Rngs,
    ):
        assert encoder.is_video, "VJEPA expects a video (tubelet) encoder"
        self.context_encoder = encoder
        self.predictor = predictor
        self.target_encoder = nnx.clone(encoder)
        self.grid = tuple(encoder.patch_embed.grid)  # (T', gh, gw)
        self.mask_ratio = mask_ratio
        self.num_masks = num_masks
        self.loss_exp = loss_exp
        self.reg_coeff = reg_coeff
        self.moving_average_decay = moving_average_decay
        self.base_lr = base_lr
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        t, gh, gw = self.grid
        spatial_keep = max(int(round(gh * gw * (1.0 - mask_ratio))), 1)
        self.n_context = spatial_keep * t
        self.n_target = (gh * gw - spatial_keep) * t
        self._momentum_fn = lambda step: jnp.asarray(
            moving_average_decay if isinstance(moving_average_decay, (int, float)) else moving_average_decay[0], jnp.float32
        )

    def setup_schedules(self, steps_per_epoch: int, epochs: int) -> None:
        if not isinstance(self.moving_average_decay, (int, float)):
            m0, m1 = self.moving_average_decay
            self._momentum_fn = linear_schedule(m0, m1, steps_per_epoch * epochs)

    def training_loss(self, batch: dict, key: jax.Array, step):
        x = as_float_image(batch["image"])  # (B, T, H, W, C)
        b = x.shape[0]
        keeps = random_tube_masks(key, b, self.grid, self.mask_ratio, self.num_masks)  # (M, B, N)

        target_out = self.target_encoder.forward_features(x)
        h_full = _layer_norm(jax.lax.stop_gradient(target_out["x_norm_patchtokens"]))

        loss_jepa = jnp.zeros((), jnp.float32)
        reg = jnp.zeros((), jnp.float32)
        for i in range(self.num_masks):
            keep = keeps[i]
            ctx_idx = _mask_to_indices(keep, self.n_context)
            tgt_idx = _mask_to_indices(~keep, self.n_target)
            ctx_out = self.context_encoder.forward_features(x, mask_indices=ctx_idx)
            z = self.predictor.predict(ctx_out["x_norm_patchtokens"], ctx_idx, tgt_idx, mask_index=i)
            h = jnp.take_along_axis(h_full, tgt_idx[:, :, None], axis=1)
            loss_jepa = loss_jepa + jnp.mean(jnp.abs(z.astype(jnp.float32) - h) ** self.loss_exp) / self.loss_exp
            pstd = jnp.sqrt(z.astype(jnp.float32).var(axis=1) + 1e-4)  # variance across patches
            reg = reg + jnp.mean(jax.nn.relu(1.0 - pstd))
        loss_jepa = loss_jepa / self.num_masks
        reg = reg / self.num_masks
        loss = loss_jepa + self.reg_coeff * reg
        return loss, {"loss": loss, "loss_jepa": loss_jepa, "loss_reg": reg}

    def on_train_batch_end(self, aux: dict, step) -> None:
        decay = self._momentum_fn(step)
        nnx.update(
            self.target_encoder,
            ema_update(nnx.state(self.target_encoder, nnx.Param), nnx.state(self.context_encoder, nnx.Param), decay),
        )

    def get_embeddings(self, x):
        out = self.target_encoder.forward_features(x)
        return _layer_norm(out["x_norm_patchtokens"])
