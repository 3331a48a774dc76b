"""Reconstruction decoders (probe + MAE).

Capability parity with reference tactile_ssl/probe/reconstruction.py:
* :class:`DecoderViT` (:16-38): linear embed -> +pos -> blocks -> norm ->
  per-patch pixel prediction; used as the online reconstruction probe.
* :class:`MaskDecoderViT` (:40-74): additionally scatters mask tokens back
  into the full sequence via ``ids_restore`` before decoding (He-style MAE
  decoder). The torch gather-restore becomes one take_along_axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.vit_layers import LN_EPS, Block
from ..ops.posenc import sincos_nd


class DecoderViT(nnx.Module):
    def __init__(
        self,
        *,
        input_embed_dim: int,
        img_size=(224, 224),
        patch_size: int = 16,
        in_chans: int = 3,
        embed_dim: int = 512,
        depth: int = 8,
        num_heads: int = 12,
        mlp_ratio: float = 4.0,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        self.patch_size = patch_size
        self.in_chans = in_chans
        self.grid = (img_size[0] // patch_size, img_size[1] // patch_size)
        self.embed_dim = embed_dim
        self.decoder_embed = nnx.Linear(input_embed_dim, embed_dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self._pos_table = nnx.data(sincos_nd(self.grid, embed_dim))
        self.blocks = nnx.List(
            [Block(embed_dim, num_heads, mlp_ratio=mlp_ratio, init_values=1.0, dtype=dtype, rngs=rngs) for _ in range(depth)]
        )
        self.norm = nnx.LayerNorm(embed_dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.decoder_pred = nnx.Linear(embed_dim, patch_size * patch_size * in_chans, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def _decode(self, tokens):
        x = tokens + self._pos_table[None].astype(tokens.dtype)
        for blk in self.blocks:
            x = blk(x)
        return self.decoder_pred(self.norm(x))

    def __call__(self, z, **_):
        return self._decode(self.decoder_embed(z))


class MaskDecoderViT(DecoderViT):
    def __init__(self, **kwargs):
        rngs = kwargs["rngs"]
        super().__init__(**kwargs)
        self.mask_token = nnx.Param(jax.random.normal(rngs.params(), (1, 1, self.embed_dim), jnp.float32) * 0.02)

    def __call__(self, z, ids_restore: jnp.ndarray, **_):
        """z: (B, K, D_in) visible-token latents; ids_restore: (B, N)."""
        x = self.decoder_embed(z)
        b, k, d = x.shape
        n = ids_restore.shape[1]
        mask = jnp.broadcast_to(self.mask_token[...].astype(x.dtype), (b, n - k, d))
        x_full = jnp.concatenate([x, mask], axis=1)
        x_full = jnp.take_along_axis(x_full, ids_restore[:, :, None], axis=1)
        return self._decode(x_full)
