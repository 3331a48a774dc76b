"""Supervised-probe harness over frozen/finetuned encoders.

Capability parity with the reference SLModule
(reference tactile_ssl/downstream_task/sl_module.py:18-148): wraps an encoder
plus a task head, loads the encoder from an SSL checkpoint with per-algorithm
key surgery ("jepa" -> target_encoder, "dino" -> teacher_(encoder|backbone),
else encoder; :81-103), freezes the encoder unless ``train_encoder``
(expressed as a trainable_filter + stop_gradient), and provides the WD-split
optimizer with warmup-cosine LR (:117-148). Runs under the same Trainer as
the SSL modules.
"""
from __future__ import annotations

from typing import Optional

import jax
from flax import nnx

from ..ssl.module import SSLModule
from ..train.checkpoint import load_checkpoint


class EncoderWrapper(nnx.Module):
    """encoder -> patch tokens (B, N, D); hides forward_features variants."""

    def __init__(self, encoder):
        self.encoder = encoder

    def __call__(self, x):
        if hasattr(self.encoder, "forward_features"):
            return self.encoder.forward_features(x)["x_norm_patchtokens"]
        return self.encoder(x)


def load_encoder_from_checkpoint(encoder: nnx.Module, ckpt_path: str, encoder_type: str = "jepa") -> None:
    """Key-surgery encoder loading (reference sl_module.py:81-103).

    Works against this framework's Trainer checkpoints (payload["model"] pure
    dicts): jepa -> 'target_encoder', dino/vtdino -> 'teacher_backbone'
    (falling back to 'teacher_encoder'/'backbone' nestings), mae/else ->
    'encoder'."""
    payload = load_checkpoint(ckpt_path)
    tree = payload["model"] if "model" in payload else payload
    if "jepa" in encoder_type:
        keys = ["target_encoder"]
    elif "dino" in encoder_type:
        keys = ["teacher_backbone", "teacher_encoder"]
    else:
        keys = ["encoder"]
    sub = None
    for k in keys:
        if k in tree:
            sub = tree[k]
            break
    if sub is None:
        raise KeyError(f"no encoder subtree {keys} in checkpoint {ckpt_path}; top-level keys: {list(tree)[:10]}")
    if isinstance(sub, dict) and "backbone" in sub:
        sub = sub["backbone"]
    state = nnx.state(encoder)
    nnx.replace_by_pure_dict(state, sub)
    nnx.update(encoder, state)


class SLModuleBase(SSLModule):
    trainable_filter = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("model_encoder")))

    def __init__(
        self,
        model_encoder,
        model_task,
        *,
        checkpoint_encoder: Optional[str] = None,
        encoder_type: str = "jepa",
        train_encoder: bool = False,
        base_lr: float = 1e-4,
        weight_decay: float = 0.04,
        warmup_epochs: int = 1,
    ):
        self.model_encoder = EncoderWrapper(model_encoder) if not isinstance(model_encoder, EncoderWrapper) else model_encoder
        self.model_task = model_task
        self.train_encoder = train_encoder
        self.encoder_type = encoder_type
        self.base_lr = base_lr
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        if checkpoint_encoder is not None:
            load_encoder_from_checkpoint(self.model_encoder.encoder, checkpoint_encoder, encoder_type)
        if train_encoder:
            # finetune mode: the optimizer moves the encoder too
            self.trainable_filter = nnx.Param

    def encode(self, x):
        from ..ssl.module import as_float_image

        z = self.model_encoder(as_float_image(x))
        if not self.train_encoder:
            z = jax.lax.stop_gradient(z)
        return z
