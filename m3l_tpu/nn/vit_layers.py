"""DINOv2-style transformer building blocks (flax.nnx).

Capability parity with the reference's layer library
(reference tactile_ssl/model/layers/*): Attention (qkv+proj bias),
Mlp / fused SwiGLU FFN, LayerScale, DropPath (stochastic depth), pre-norm
Block, CrossAttention(+Block), DINOHead (L2-normalized bottleneck +
weight-normed last layer), and conv patch embeddings (2D + 3D tubelets).

TPU notes: the reference's xformers ``memory_efficient_attention`` and
``BlockDiagonalMask`` ragged batching (attention.py:92, block.py:211-260)
are replaced by plain XLA attention with an optional boolean key mask — at
tactile sequence lengths (<=256 tokens) fused flash attention buys nothing,
and pad-and-mask at static shapes is the XLA-friendly form of ragged
batching (SURVEY.md §7 hard-part #5). LayerNorm eps follows the reference's
1e-6 (vision_transformer.py:109 norm_layer).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

LN_EPS = 1e-6


def _linear(i, o, bias, dtype, rngs):
    return nnx.Linear(i, o, use_bias=bias, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)


class Mlp(nnx.Module):
    def __init__(self, dim: int, hidden: int, out: Optional[int] = None, *, bias: bool = True, dtype=jnp.float32, rngs: nnx.Rngs):
        self.fc1 = _linear(dim, hidden, bias, dtype, rngs)
        self.fc2 = _linear(hidden, out or dim, bias, dtype, rngs)

    def __call__(self, x):
        return self.fc2(nnx.gelu(self.fc1(x), approximate=False))


class SwiGLUFFN(nnx.Module):
    """Fused SwiGLU FFN; hidden sized as DINOv2's SwiGLUFFNFused
    (2/3 * mlp_hidden rounded up to a multiple of 8)."""

    def __init__(self, dim: int, hidden: int, out: Optional[int] = None, *, bias: bool = True, dtype=jnp.float32, rngs: nnx.Rngs):
        hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
        self.w12 = _linear(dim, 2 * hidden, bias, dtype, rngs)
        self.w3 = _linear(hidden, out or dim, bias, dtype, rngs)
        self.hidden = hidden

    def __call__(self, x):
        x12 = self.w12(x)
        x1, x2 = x12[..., : self.hidden], x12[..., self.hidden :]
        return self.w3(nnx.silu(x1) * x2)


class LayerScale(nnx.Module):
    def __init__(self, dim: int, init_values: float = 1.0, *, rngs: nnx.Rngs):
        self.gamma = nnx.Param(jnp.full((dim,), init_values, jnp.float32))

    def __call__(self, x):
        return x * self.gamma[...].astype(x.dtype)


def drop_path(x: jnp.ndarray, rate: float, key: Optional[jax.Array]) -> jnp.ndarray:
    """Per-sample stochastic depth. Inference / rate==0 / no key -> identity."""
    if rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class Attention(nnx.Module):
    def __init__(self, dim: int, num_heads: int, *, qkv_bias: bool = True, proj_bias: bool = True, dtype=jnp.float32, rngs: nnx.Rngs):
        assert dim % num_heads == 0
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = _linear(dim, dim * 3, qkv_bias, dtype, rngs)
        self.proj = _linear(dim, dim, proj_bias, dtype, rngs)

    def __call__(self, x, key_mask: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        h, dh = self.num_heads, self.head_dim
        from .flash_attention import flash_attention_qkv, use_flash

        if use_flash():
            # qkv-fused pallas attention (VMEM head split + softmax);
            # einsum fallback off-TPU
            out = flash_attention_qkv(self.qkv(x), h, key_mask=key_mask, scale=self.scale)
            return self.proj(out)
        qkv = self.qkv(x).reshape(b, n, 3, h, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) * self.scale
        scores = scores.astype(jnp.float32)
        if key_mask is not None:
            bias = jnp.where(key_mask[:, None, None, :], 0.0, -1e30)
            scores = scores + bias
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, h * dh)
        return self.proj(out)


class CrossAttention(nnx.Module):
    """Queries attend to a separate key/value sequence (reference
    layers/attention.py:101-176)."""

    def __init__(self, dim: int, num_heads: int, *, qkv_bias: bool = True, proj_bias: bool = True, dtype=jnp.float32, rngs: nnx.Rngs):
        assert dim % num_heads == 0
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.q = _linear(dim, dim, qkv_bias, dtype, rngs)
        self.kv = _linear(dim, dim * 2, qkv_bias, dtype, rngs)
        self.proj = _linear(dim, dim, proj_bias, dtype, rngs)

    def __call__(self, q_in, kv_in, key_mask: Optional[jnp.ndarray] = None):
        b, nq, _ = q_in.shape
        nk = kv_in.shape[1]
        h, dh = self.num_heads, self.head_dim
        q = self.q(q_in).reshape(b, nq, h, dh)
        kv = self.kv(kv_in).reshape(b, nk, 2, h, dh)
        k, v = kv[:, :, 0], kv[:, :, 1]
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) * self.scale
        scores = scores.astype(jnp.float32)
        if key_mask is not None:
            scores = scores + jnp.where(key_mask[:, None, None, :], 0.0, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, nq, h * dh)
        return self.proj(out)


class Block(nnx.Module):
    """Pre-norm block with LayerScale + stochastic depth
    (reference layers/block.py:43-116)."""

    def __init__(
        self,
        dim: int,
        num_heads: int,
        *,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        proj_bias: bool = True,
        ffn_bias: bool = True,
        drop_path_rate: float = 0.0,
        init_values: Optional[float] = 1.0,
        ffn_layer: str = "mlp",
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.norm1 = nnx.LayerNorm(dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.attn = Attention(dim, num_heads, qkv_bias=qkv_bias, proj_bias=proj_bias, dtype=dtype, rngs=rngs)
        self.ls1 = LayerScale(dim, init_values, rngs=rngs) if init_values else None
        self.norm2 = nnx.LayerNorm(dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        hidden = int(dim * mlp_ratio)
        if ffn_layer == "mlp":
            self.mlp = Mlp(dim, hidden, bias=ffn_bias, dtype=dtype, rngs=rngs)
        elif ffn_layer in ("swiglu", "swiglufused"):
            self.mlp = SwiGLUFFN(dim, hidden, bias=ffn_bias, dtype=dtype, rngs=rngs)
        elif ffn_layer == "identity":
            self.mlp = lambda x: x
        else:
            raise NotImplementedError(ffn_layer)
        self.ls2 = LayerScale(dim, init_values, rngs=rngs) if init_values else None
        self.drop_path_rate = drop_path_rate

    def __call__(self, x, key_mask=None, dp_key: Optional[jax.Array] = None):
        k1 = k2 = None
        if dp_key is not None:
            k1, k2 = jax.random.split(dp_key)
        h = self.attn(self.norm1(x), key_mask)
        if self.ls1 is not None:
            h = self.ls1(h)
        x = x + drop_path(h, self.drop_path_rate, k1)
        h = self.mlp(self.norm2(x))
        if self.ls2 is not None:
            h = self.ls2(h)
        return x + drop_path(h, self.drop_path_rate, k2)


class CrossAttentionBlock(nnx.Module):
    """Pre-norm cross-attention block (reference layers/block.py ~177-200 /
    downstream_task/attentive_pooler.py usage)."""

    def __init__(self, dim: int, num_heads: int, *, mlp_ratio: float = 4.0, qkv_bias: bool = True, dtype=jnp.float32, rngs: nnx.Rngs):
        self.norm_q = nnx.LayerNorm(dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.norm_kv = nnx.LayerNorm(dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.xattn = CrossAttention(dim, num_heads, qkv_bias=qkv_bias, dtype=dtype, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), dtype=dtype, rngs=rngs)

    def __call__(self, q, kv, key_mask=None):
        q = q + self.xattn(self.norm_q(q), self.norm_kv(kv), key_mask)
        return q + self.mlp(self.norm2(q))


class DINOHead(nnx.Module):
    """MLP -> L2-normalized bottleneck -> weight-normed linear
    (reference layers/dino_head.py:34-48)."""

    def __init__(self, in_dim: int, out_dim: int, *, hidden_dim: int = 2048, bottleneck_dim: int = 256, nlayers: int = 3, mlp_bias: bool = True, dtype=jnp.float32, rngs: nnx.Rngs):
        nlayers = max(nlayers, 1)
        dims = [in_dim] + [hidden_dim] * (nlayers - 1) + [bottleneck_dim]
        self.mlp_layers = nnx.List([_linear(dims[i], dims[i + 1], mlp_bias, dtype, rngs) for i in range(nlayers)])
        # weight-norm parametrization: W[o, :] = g[o] * V[o, :] / ||V[o, :]||
        self.last_v = nnx.Param(jax.random.normal(rngs.params(), (out_dim, bottleneck_dim), jnp.float32) * 0.02)
        self.last_g = nnx.Param(jnp.ones((out_dim,), jnp.float32))
        self.out_dim = out_dim

    def __call__(self, x):
        for i, layer in enumerate(self.mlp_layers):
            x = layer(x)
            if i < len(self.mlp_layers) - 1:
                x = nnx.gelu(x, approximate=False)
        x = x.astype(jnp.float32)
        eps = 1e-6
        # sqrt(sum + eps^2) instead of max(norm, eps): the max() clamps the
        # forward but the norm's VJP is still 0/0 = NaN at an exactly-zero
        # vector (same hazard family as the KoLeo fix in ssl/losses.py)
        x = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)
        v = self.last_v[...]
        w = self.last_g[...][:, None] * v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)
        return x @ w.T


class PatchEmbed(nnx.Module):
    """Conv patchifier, NHWC (reference layers/patch_embed.py:39-115)."""

    def __init__(self, img_size, patch_size: int, in_chans: int, embed_dim: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.in_chans = in_chans
        self.grid = (img_size[0] // patch_size, img_size[1] // patch_size)
        self.num_patches = self.grid[0] * self.grid[1]
        self.proj = nnx.Conv(in_chans, embed_dim, kernel_size=(patch_size, patch_size), strides=(patch_size, patch_size), padding="VALID", dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        x = self.proj(x)  # (B, gh, gw, D)
        b, gh, gw, d = x.shape
        return x.reshape(b, gh * gw, d)


class PatchEmbed3D(nnx.Module):
    """Video tubelet patchifier, input (B, T, H, W, C)
    (reference layers/patch_embed.py:116-132)."""

    def __init__(self, num_frames: int, tubelet_size: int, img_size, patch_size: int, in_chans: int, embed_dim: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.tubelet_size = tubelet_size
        self.in_chans = in_chans
        self.grid = (num_frames // tubelet_size, img_size[0] // patch_size, img_size[1] // patch_size)
        self.num_patches = self.grid[0] * self.grid[1] * self.grid[2]
        self.proj = nnx.Conv(
            in_chans,
            embed_dim,
            kernel_size=(tubelet_size, patch_size, patch_size),
            strides=(tubelet_size, patch_size, patch_size),
            padding="VALID",
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )

    def __call__(self, x):
        x = self.proj(x)  # (B, t, gh, gw, D)
        b = x.shape[0]
        return x.reshape(b, -1, x.shape[-1])
