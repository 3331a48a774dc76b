"""Frozen-encoder feature extractor for DINO-feature PPO.

Capability parity with the reference DINOExtractor
(reference models/pretrain_policy.py:39-120): packs the vt_load'ed obs into
per-modality crops, reshapes (B, fs*3modalities) crops of (H, W, 3), runs the
frozen encoder on every crop, reassembles (B, n_crops, D), applies one extra
depth-1 transformer and mean-pools. The encoder output is wrapped in
``stop_gradient``: with plain Adam and no weight decay its parameters receive
exactly zero updates, reproducing ``requires_grad_(False)`` freezing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.transformer import Transformer
from ..utils.obs import vt_load


class FrozenEncoderFeatures(nnx.Module):
    def __init__(self, encoder, dim: int, *, frame_stack: int = 1, crop_size: int = 70, dtype=jnp.float32, rngs: nnx.Rngs):
        self.encoder = encoder
        self.frame_stack = frame_stack
        self.crop_size = crop_size
        self.post = Transformer(dim, depth=1, heads=4, dim_head=64, mlp_dim=dim * 2, dtype=dtype, rngs=rngs)

    def _crops(self, x: dict) -> jnp.ndarray:
        """(B, n_crops, S, S, 3) from the packed modalities: for each modality
        (image, tactile1..N) split the fs*3 channel stack into fs RGB crops
        (reference pretrain_policy.py:84-104 packing order: modality-major)."""
        crops = []
        keys = ["image"] + sorted(k for k in x if k.startswith("tactile"))
        for k in keys:
            v = x[k]
            b, h, w, c = v.shape
            fs = c // 3
            v = v.reshape(b, h, w, fs, 3).transpose(0, 3, 1, 2, 4)  # (B, fs, H, W, 3)
            if (h, w) != (self.crop_size, self.crop_size):
                v = jax.image.resize(v, (b, fs, self.crop_size, self.crop_size, 3), method="bilinear")
            crops.append(v)
        return jnp.concatenate(crops, axis=1)  # (B, n_modalities*fs, S, S, 3)

    def from_packed(self, x: dict) -> jnp.ndarray:
        crops = self._crops(x)
        b, n, s, _, _ = crops.shape
        flat = crops.reshape(b * n, s, s, 3)
        feats = self.encoder(flat)  # (B*n, D) CLS features
        feats = jax.lax.stop_gradient(feats)  # frozen encoder
        feats = feats.reshape(b, n, -1)
        z = self.post(feats)
        return jnp.mean(z, axis=1)

    def __call__(self, obs: dict) -> jnp.ndarray:
        return self.from_packed(vt_load(obs, frame_stack=self.frame_stack))
