"""Downstream probe heads over frozen/finetuned encoder tokens.

Capability parity with the reference probes:
* ForceLinearProbe (force_sl.py:25-64): AttentivePooler -> 2-layer MLP -> 3
  DoF, optional tanh/sigmoid last activations.
* SlipProbe / SlipForceProbe (slip_decoders.py:12-131): pooled classifier,
  force-conditioned variant concatenates a (delta-)force vector.
* PoseLinearProbe (pose_sl.py:35-99): three class heads (x / y / theta bins).
* GraspLinearProbe (grasp_sl.py:27-65): binary grasp-stability classifier.
* TextileLinearProbe (textile_sl.py:32-72): 20-way textile classifier.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.vit import VIT_EMBED_DIMS
from .attentive_pooler import AttentivePooler


def _dim(embed_dim) -> int:
    if isinstance(embed_dim, str):
        return VIT_EMBED_DIMS[f"vit_{embed_dim}"]
    return int(embed_dim)


def _mlp_head(dim, out, dtype, rngs):
    return nnx.List(
        [
            nnx.Linear(dim, dim // 4, dtype=dtype, param_dtype=jnp.float32, rngs=rngs),
            nnx.Linear(dim // 4, out, dtype=dtype, param_dtype=jnp.float32, rngs=rngs),
        ]
    )


def _run_head(head, x):
    return head[1](nnx.relu(head[0](x)))


class ForceLinearProbe(nnx.Module):
    def __init__(self, embed_dim="base", *, num_heads: int = 12, depth: int = 1, with_last_activations: bool = False, dtype=jnp.float32, rngs: nnx.Rngs):
        dim = _dim(embed_dim)
        self.pooler = AttentivePooler(num_queries=1, embed_dim=dim, num_heads=num_heads, depth=depth, dtype=dtype, rngs=rngs)
        self.head = _mlp_head(dim, 3, dtype, rngs)
        self.with_last_activations = with_last_activations

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        y = _run_head(self.head, self.pooler(tokens)[:, 0]).astype(jnp.float32)
        if self.with_last_activations:
            y = jnp.concatenate([jnp.tanh(y[:, :2]), jax.nn.sigmoid(y[:, 2:])], axis=-1)
        return y


class SlipProbe(nnx.Module):
    def __init__(self, embed_dim="base", *, num_classes: int = 2, num_heads: int = 12, depth: int = 1, dtype=jnp.float32, rngs: nnx.Rngs):
        dim = _dim(embed_dim)
        self.pooler = AttentivePooler(num_queries=1, embed_dim=dim, num_heads=num_heads, depth=depth, dtype=dtype, rngs=rngs)
        self.head = _mlp_head(dim, num_classes, dtype, rngs)
        self.num_classes = num_classes

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return _run_head(self.head, self.pooler(tokens)[:, 0]).astype(jnp.float32)


class SlipForceProbe(nnx.Module):
    """Slip classifier conditioned on a (delta-)force vector
    (reference slip_decoders.py:69-131)."""

    def __init__(self, embed_dim="base", *, num_classes: int = 2, force_dim: int = 3, num_heads: int = 12, depth: int = 1, dtype=jnp.float32, rngs: nnx.Rngs):
        dim = _dim(embed_dim)
        self.pooler = AttentivePooler(num_queries=1, embed_dim=dim, num_heads=num_heads, depth=depth, dtype=dtype, rngs=rngs)
        self.force_proj = nnx.Linear(force_dim, dim // 4, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.fc1 = nnx.Linear(dim + dim // 4, dim // 4, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.fc2 = nnx.Linear(dim // 4, num_classes, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.num_classes = num_classes

    def __call__(self, tokens: jnp.ndarray, force: jnp.ndarray) -> jnp.ndarray:
        pooled = self.pooler(tokens)[:, 0]
        f = nnx.relu(self.force_proj(force.astype(pooled.dtype)))
        h = nnx.relu(self.fc1(jnp.concatenate([pooled, f], axis=-1)))
        return self.fc2(h).astype(jnp.float32)


class PoseLinearProbe(nnx.Module):
    def __init__(self, embed_dim="base", *, num_classes: int = 10, num_heads: int = 12, depth: int = 1, dtype=jnp.float32, rngs: nnx.Rngs):
        dim = _dim(embed_dim)
        self.num_classes = num_classes
        self.pooler = AttentivePooler(num_queries=1, embed_dim=dim, num_heads=num_heads, depth=depth, dtype=dtype, rngs=rngs)
        self.head_x = _mlp_head(dim, num_classes, dtype, rngs)
        self.head_y = _mlp_head(dim, num_classes, dtype, rngs)
        self.head_theta = _mlp_head(dim, num_classes, dtype, rngs)

    def __call__(self, tokens: jnp.ndarray) -> dict:
        pooled = self.pooler(tokens)[:, 0]
        return {
            "x": _run_head(self.head_x, pooled).astype(jnp.float32),
            "y": _run_head(self.head_y, pooled).astype(jnp.float32),
            "theta": _run_head(self.head_theta, pooled).astype(jnp.float32),
        }


class GraspLinearProbe(nnx.Module):
    def __init__(self, embed_dim="base", *, num_classes: int = 2, num_heads: int = 12, depth: int = 1, dtype=jnp.float32, rngs: nnx.Rngs):
        dim = _dim(embed_dim)
        self.pooler = AttentivePooler(num_queries=1, embed_dim=dim, num_heads=num_heads, depth=depth, dtype=dtype, rngs=rngs)
        self.head = _mlp_head(dim, num_classes, dtype, rngs)
        self.num_classes = num_classes

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return _run_head(self.head, self.pooler(tokens)[:, 0]).astype(jnp.float32)


class TextileLinearProbe(nnx.Module):
    def __init__(self, embed_dim="base", *, num_classes: int = 20, num_heads: int = 12, depth: int = 1, dtype=jnp.float32, rngs: nnx.Rngs):
        dim = _dim(embed_dim)
        self.pooler = AttentivePooler(num_queries=1, embed_dim=dim, num_heads=num_heads, depth=depth, dtype=dtype, rngs=rngs)
        self.head = _mlp_head(dim, num_classes, dtype, rngs)
        self.num_classes = num_classes

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return _run_head(self.head, self.pooler(tokens)[:, 0]).astype(jnp.float32)
