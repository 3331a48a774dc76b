"""Reconstruction decoders (probe + MAE).

Capability parity with reference tactile_ssl/probe/reconstruction.py:
* :class:`DecoderViT` (:16-38): linear embed -> +pos -> blocks -> norm ->
  per-patch pixel prediction; used as the online reconstruction probe.
* :class:`MaskDecoderViT` (:40-74): additionally scatters mask tokens back
  into the full sequence via ``ids_restore`` before decoding (He-style MAE
  decoder). The torch gather-restore becomes one take_along_axis.
* :class:`MaskedQueryDecoderViT`: TPU-side throughput variant — the MAE loss
  only reads masked positions (reference mae.py:129-144), so the decoder
  runs cross-attention blocks whose queries are ONLY the masked tokens and
  whose keys/values are the encoder's visible tokens (CrossMAE-style,
  arXiv:2401.14391). Cuts decoder FLOPs ~1.5x at mask 0.75 (147 query +
  49 kv tokens vs 196 self-attention tokens). Deviation from the reference
  architecture — opt-in via MAEModule(decode_masked_only=True); documented
  in docs/PARITY.md.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.vit_layers import LN_EPS, Block, CrossAttentionBlock
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


class MaskedQueryDecoderViT(nnx.Module):
    """CrossMAE-style masked-query decoder (see module docstring).

    Queries = mask token + pos-embed of each MASKED position (evolving
    through the blocks); keys/values = embedded visible-token latents +
    their pos-embeds (fixed across blocks, as in CrossMAE's decoupled
    decoder). Predictions are scattered back to the full (B, N, p*p*c)
    layout with zeros at visible positions, which the masked MSE ignores.
    """

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
        self.mask_token = nnx.Param(jax.random.normal(rngs.params(), (1, 1, embed_dim), jnp.float32) * 0.02)
        self.blocks = nnx.List(
            [CrossAttentionBlock(embed_dim, num_heads, mlp_ratio=mlp_ratio, dtype=dtype, rngs=rngs) for _ in range(depth)]
        )
        self.norm = nnx.LayerNorm(embed_dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.decoder_pred = nnx.Linear(embed_dim, patch_size * patch_size * in_chans, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, z, ids_keep: jnp.ndarray, ids_masked: jnp.ndarray, **_):
        """z: (B, K, D_in) visible latents; ids_keep: (B, K); ids_masked:
        (B, M). Returns (B, N, p*p*c) with zeros at visible positions."""
        kv = self.decoder_embed(z)
        b, k, d = kv.shape
        m = ids_masked.shape[1]
        pos = self._pos_table.astype(kv.dtype)  # (N, D)
        kv = kv + jnp.take(pos, ids_keep, axis=0).reshape(b, k, d)
        q = self.mask_token[...].astype(kv.dtype) + jnp.take(pos, ids_masked, axis=0).reshape(b, m, d)
        for blk in self.blocks:
            q = blk(q, kv)
        pred_m = self.decoder_pred(self.norm(q))  # (B, M, ppc)
        n = self._pos_table.shape[0]
        out = jnp.zeros((b, n, pred_m.shape[-1]), pred_m.dtype)
        return out.at[jnp.arange(b)[:, None], ids_masked].set(pred_m)
