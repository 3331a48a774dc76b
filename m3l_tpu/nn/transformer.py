"""Pre-norm ViT transformer stack (flax.nnx).

Math contract matches the vit-pytorch ``Transformer`` the reference builds its
VTT encoder and MAE decoder from (reference: models/pretrain_models.py:113,784
via ``vit_pytorch.vit.Transformer``):

* per block:  x = x + Attn(LN(x));  x = x + FF(LN(x))
* Attention: fused qkv projection (no bias), per-head scaled dot-product,
  output projection (with bias) unless heads==1 and dim_head==dim.
* FeedForward: LN -> Linear -> GELU(exact) -> Linear.
* final LayerNorm on the stack output.

TPU notes: the qkv projection is one (D, 3*H*Dh) matmul whose packed output
feeds the qkv-fused pallas flash-attention kernel directly (head split +
f32 softmax in VMEM, nn/flash_attention.py; measured vs the einsum path in
BASELINE.md — the (B,H,N,N) f32 HBM round-trip and head-split transposes
dominate at M3L shapes). Einsum fallback off-TPU. Compute dtype is
configurable (bfloat16 for throughput); parameters and LayerNorm statistics
stay float32.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


def _ln(norm: nnx.LayerNorm, x: jnp.ndarray) -> jnp.ndarray:
    """nnx.LayerNorm. A pallas fused-LN kernel was benched against XLA's
    fusion at the flagship shape (round 4: 1.474 vs 1.432 ms fwd+bwd for
    (98304, 256)) and removed — XLA already fuses this well."""
    return norm(x)


class Attention(nnx.Module):
    def __init__(self, dim: int, heads: int, dim_head: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        inner = heads * dim_head
        self.heads = heads
        self.dim_head = dim_head
        self.scale = dim_head**-0.5
        self.project_out = not (heads == 1 and dim_head == dim)
        self.norm = nnx.LayerNorm(dim, epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.to_qkv = nnx.Linear(dim, inner * 3, use_bias=False, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        if self.project_out:
            self.to_out = nnx.Linear(inner, dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x: jnp.ndarray, key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        x = _ln(self.norm, x)
        from .flash_attention import flash_attention_qkv, use_flash

        if use_flash():
            # qkv-fused pallas kernel: head split AND scores/softmax stay in
            # VMEM (the einsum path's (B,H,N,N) f32 HBM round-trip plus the
            # head-split transposes dominate at these shapes)
            out = flash_attention_qkv(self.to_qkv(x), h, key_mask=key_mask, scale=self.scale)
        else:
            qkv = self.to_qkv(x).reshape(b, n, 3, h, dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, dh)
            scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) * self.scale
            scores = scores.astype(jnp.float32)
            if key_mask is not None:
                scores = scores + jnp.where(key_mask[:, None, None, :], 0.0, -1e30)
            attn = nnx.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, h * dh)
        if self.project_out:
            out = self.to_out(out)
        return out


class FeedForward(nnx.Module):
    def __init__(self, dim: int, hidden_dim: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.norm = nnx.LayerNorm(dim, epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.fc1 = nnx.Linear(dim, hidden_dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.fc2 = nnx.Linear(hidden_dim, dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # exact (erf) GELU, matching torch nn.GELU default
        return self.fc2(nnx.gelu(self.fc1(_ln(self.norm, x)), approximate=False))


class Transformer(nnx.Module):
    """Depth-stacked pre-norm blocks with a final LayerNorm."""

    def __init__(self, dim: int, depth: int, heads: int, dim_head: int, mlp_dim: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.blocks = nnx.List(
            [
                nnx.List([Attention(dim, heads, dim_head, dtype=dtype, rngs=rngs), FeedForward(dim, mlp_dim, dtype=dtype, rngs=rngs)])
                for _ in range(depth)
            ]
        )
        self.norm = nnx.LayerNorm(dim, epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x: jnp.ndarray, key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        for attn, ff in self.blocks:
            x = attn(x, key_mask) + x
            x = ff(x) + x
        return _ln(self.norm, x)
