"""I-JEPA: latent prediction of masked target blocks from a context block.

Capability parity with the reference IJEPAModule
(reference tactile_ssl/algorithm/ijepa.py:55-449): EMA target encoder,
multi-block target masks + one context block with targets cut out,
predictor conditioned on context latents + target positions, smooth-L1
against layer-normed target latents (:298-329), EMA update per batch with a
momentum ramp (:109-128).

TPU redesign: the reference's per-sample rejection-sampled masks
(:137-296) become vectorized boolean block masks; the predictor runs
pad-and-mask — full-length context tokens with an attention key mask plus a
full-length bank of mask tokens, loss weighted by the target mask — so every
step is one static program (SURVEY.md §7 hard-part #4).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.vit import VisionTransformer, VisionTransformerPredictor
from .dino import _layer_norm
from .ema import ema_update
from .masks import sample_block_masks
from .module import as_float_image, SSLModule
from .schedulers import linear_schedule


class IJEPAModule(SSLModule):
    trainable_filter = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("target_encoder")))

    def __init__(
        self,
        encoder: VisionTransformer,
        predictor: VisionTransformerPredictor,
        *,
        target_mask_scale: Tuple[float, float] = (0.15, 0.2),
        context_mask_scale: Tuple[float, float] = (0.85, 1.0),
        num_target_masks: int = 4,
        num_context_masks: int = 1,
        moving_average_decay: Union[float, Tuple[float, float]] = 0.998,
        base_lr: float = 1e-4,
        weight_decay: float = 0.04,
        warmup_epochs: int = 10,
        rngs: nnx.Rngs,
    ):
        self.context_encoder = encoder
        self.predictor = predictor
        self.target_encoder = nnx.clone(encoder)
        self.grid = tuple(encoder.patch_embed.grid)
        self.target_mask_scale = target_mask_scale
        self.context_mask_scale = context_mask_scale
        self.num_target_masks = num_target_masks
        self.num_context_masks = num_context_masks
        self.moving_average_decay = moving_average_decay
        self.base_lr = base_lr
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        self._momentum_fn = lambda step: jnp.asarray(
            moving_average_decay if isinstance(moving_average_decay, (int, float)) else moving_average_decay[0], jnp.float32
        )

    def setup_schedules(self, steps_per_epoch: int, epochs: int) -> None:
        if not isinstance(self.moving_average_decay, (int, float)):
            m0, m1 = self.moving_average_decay
            self._momentum_fn = linear_schedule(m0, m1, steps_per_epoch * epochs)

    def sample_masks(self, key: jax.Array, batch: int):
        """(context (B, N) bool keep, targets (Mt, B, N) bool) — context is the
        sampled context block minus every target block (reference :200-296)."""
        k_t, k_c = jax.random.split(key)
        targets = sample_block_masks(k_t, batch, self.grid, self.target_mask_scale, self.num_target_masks)
        ctx = sample_block_masks(k_c, batch, self.grid, self.context_mask_scale, self.num_context_masks)[0]
        ctx = ctx & ~jnp.any(targets, axis=0)
        # guard: if everything got cut away, fall back to the raw context block
        ctx = jnp.where(ctx.sum(-1, keepdims=True) > 0, ctx, True)
        return ctx, targets

    def forward_loss(self, x, ctx_mask, target_masks):
        ctx_out = self.context_encoder.forward_features(x, key_mask=ctx_mask)
        ctx_tokens = ctx_out["x_norm_patchtokens"]  # (B, N, D) — masked keys excluded from attention
        target_out = self.target_encoder.forward_features(x)
        h = _layer_norm(jax.lax.stop_gradient(target_out["x_norm_patchtokens"]))

        loss = jnp.zeros((), jnp.float32)
        for i in range(self.num_target_masks):
            tgt = target_masks[i]
            pred = self.predictor.predict_padded(ctx_tokens, ctx_mask, mask_index=i)
            diff = pred.astype(jnp.float32) - h
            per_token = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5).mean(-1)  # smooth-L1
            w = tgt.astype(jnp.float32)
            loss = loss + (per_token * w).sum() / jnp.clip(w.sum(), 1.0, None)
        return loss / self.num_target_masks

    def training_loss(self, batch: dict, key: jax.Array, step):
        x = as_float_image(batch["image"])
        ctx_mask, target_masks = self.sample_masks(key, x.shape[0])
        loss = self.forward_loss(x, ctx_mask, target_masks)
        return loss, {"ssl_loss": loss, "loss": loss}

    def on_train_batch_end(self, aux: dict, step) -> None:
        decay = self._momentum_fn(step)
        nnx.update(
            self.target_encoder,
            ema_update(nnx.state(self.target_encoder, nnx.Param), nnx.state(self.context_encoder, nnx.Param), decay),
        )

    def get_embeddings(self, x):
        out = self.target_encoder.forward_features(x)
        return _layer_norm(out["x_norm_patchtokens"])
