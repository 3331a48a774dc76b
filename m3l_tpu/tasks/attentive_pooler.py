"""Attentive pooling over patch tokens.

Capability parity with the reference AttentivePooler / AttentiveClassifier
(reference tactile_ssl/downstream_task/attentive_pooler.py:18-140): learnable
query tokens cross-attend to the token sequence through one
CrossAttentionBlock (or bare CrossAttention), optionally followed by
depth-1 self-attention blocks; the classifier adds a linear head over the
pooled query.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.vit_layers import Block, CrossAttention, CrossAttentionBlock


class AttentivePooler(nnx.Module):
    def __init__(
        self,
        *,
        num_queries: int = 1,
        embed_dim: int = 768,
        num_heads: int = 12,
        mlp_ratio: float = 4.0,
        depth: int = 1,
        qkv_bias: bool = True,
        complete_block: bool = True,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.query_tokens = nnx.Param(jax.random.truncated_normal(rngs.params(), -2, 2, (1, num_queries, embed_dim), jnp.float32) * 0.02)
        self.complete_block = complete_block
        if complete_block:
            self.cross = CrossAttentionBlock(embed_dim, num_heads, mlp_ratio=mlp_ratio, qkv_bias=qkv_bias, dtype=dtype, rngs=rngs)
        else:
            self.cross = CrossAttention(embed_dim, num_heads, qkv_bias=qkv_bias, dtype=dtype, rngs=rngs)
        self.blocks = (
            nnx.List([Block(embed_dim, num_heads, mlp_ratio=mlp_ratio, qkv_bias=qkv_bias, init_values=None, dtype=dtype, rngs=rngs) for _ in range(depth - 1)])
            if depth > 1
            else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        q = jnp.broadcast_to(self.query_tokens[...], (b, *self.query_tokens[...].shape[1:])).astype(x.dtype)
        q = self.cross(q, x)
        if self.blocks is not None:
            for blk in self.blocks:
                q = blk(q)
        return q


class AttentiveClassifier(nnx.Module):
    def __init__(self, *, embed_dim: int = 768, num_heads: int = 12, mlp_ratio: float = 4.0, depth: int = 1, qkv_bias: bool = True, num_classes: int = 1000, complete_block: bool = True, dtype=jnp.float32, rngs: nnx.Rngs):
        self.pooler = AttentivePooler(num_queries=1, embed_dim=embed_dim, num_heads=num_heads, mlp_ratio=mlp_ratio, depth=depth, qkv_bias=qkv_bias, complete_block=complete_block, dtype=dtype, rngs=rngs)
        self.linear = nnx.Linear(embed_dim, num_classes, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.linear(self.pooler(x)[:, 0])
