"""SSL algorithm module protocol.

The reference's ``Module`` ABC (reference tactile_ssl/algorithm/module.py:11-50)
defines training_step / validation_step / configure_optimizers plus lifecycle
hooks, executed imperatively by the Fabric trainer. The TPU-native protocol
splits those responsibilities along the jit boundary:

* :meth:`training_loss` — PURE: (batch, rng key, step) -> (loss, aux);
  differentiated w.r.t. :attr:`trainable_filter` params inside the trainer's
  single jitted step.
* :meth:`on_train_batch_end` — mutating (EMA teacher, loss centers),
  called inside the same jitted step AFTER the optimizer update, with the
  aux dict from training_loss (subsumes the reference's
  ``on_train_batch_end`` EMA hook, dino.py:154-173).
* :meth:`configure_optimizer` — returns an optax transformation with the
  reference's WD-split (>=2-D params decayed; mae.py:160-183) and
  warmup-cosine LR / cosine-WD schedules baked in.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from .schedulers import cosine_wd_schedule, warmup_cosine_schedule


class SSLModule(nnx.Module):
    # params the optimizer moves (exclude teachers etc.)
    trainable_filter = nnx.Param

    def training_loss(self, batch: dict, key: jax.Array, step: jnp.ndarray):
        raise NotImplementedError

    def validation_loss(self, batch: dict, key: jax.Array, step: jnp.ndarray):
        return self.training_loss(batch, key, step)

    def on_train_batch_end(self, aux: dict, step: jnp.ndarray) -> None:
        """Mutating post-update hook (EMA, centers). Default: no-op."""

    def configure_optimizer(self, steps_per_epoch: int, epochs: int) -> optax.GradientTransformation:
        return default_wd_split_optimizer(
            base_lr=getattr(self, "base_lr", 1e-4),
            total_steps=steps_per_epoch * epochs,
            steps_per_epoch=steps_per_epoch,
            warmup_epochs=getattr(self, "warmup_epochs", 10),
            start_lr=getattr(self, "start_lr", 0.0),
            final_lr=getattr(self, "final_lr", 0.0),
            weight_decay=getattr(self, "weight_decay", 0.04),
            final_weight_decay=getattr(self, "final_weight_decay", None),
            betas=getattr(self, "betas", (0.9, 0.999)),
            # set by the Trainer on single-chip runs (flat-buffer AdamW; a
            # raveled vector cannot carry mp/tp shardings, so mesh runs keep
            # leaf-wise optax)
            flat=getattr(self, "_flat_optimizer", False),
        )


def as_float_image(x):
    """Dequantize uint8 images on device (TPU-first input pipeline: ship
    uint8 over the host->device link — 4x less transfer — and convert next
    to the first conv; float inputs pass through unchanged)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def wd_mask(params) -> Any:
    """Decay only >=2-D parameters (reference mae.py:167-176 WD split)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def default_wd_split_optimizer(
    *,
    base_lr: float,
    total_steps: int,
    steps_per_epoch: int,
    warmup_epochs: int = 10,
    start_lr: float = 0.0,
    final_lr: float = 0.0,
    weight_decay: float = 0.04,
    final_weight_decay: Optional[float] = None,
    betas=(0.9, 0.999),
    clip_norm: Optional[float] = None,
    flat: bool = False,
) -> optax.GradientTransformation:
    lr = warmup_cosine_schedule(base_lr, start_lr, final_lr, warmup_epochs * steps_per_epoch, total_steps)
    if final_weight_decay is not None:
        wd = cosine_wd_schedule(weight_decay, final_weight_decay, total_steps)
    else:
        wd = weight_decay
    if flat:
        # flat-buffer AdamW (train/optim.py): one fused elementwise update
        # over a single raveled vector instead of ~100 tile-padded leaf ops;
        # same WD split and schedule semantics (tests/test_optim.py)
        from ..train.optim import flat_adamw

        adamw = flat_adamw(lr, wd, b1=betas[0], b2=betas[1])
    else:
        adamw = optax.inject_hyperparams(optax.adamw, static_args=("mask", "b1", "b2"))(
            learning_rate=lr, weight_decay=wd, b1=betas[0], b2=betas[1], mask=wd_mask
        )
    if clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_norm), adamw)
    return adamw
