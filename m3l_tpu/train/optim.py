"""Flat-buffer fused Adam (TPU perf lever, BASELINE.md round-3 list).

optax applies Adam leaf-by-leaf: at M3L scale (~100 leaves, many of them
small (d,) biases/norm scales) the update costs ~3.6 ms of the 70 ms fused
minibatch — ~8x the pure HBM-bandwidth floor — because each small leaf pays
TPU (8,128) tile padding and per-op overhead. ``flat_adam`` ravels the
gradient pytree into ONE contiguous fp32 vector and keeps both Adam moments
flat, so the whole update is three large fused elementwise kernels; the
optional global-norm clip becomes a single-vector norm instead of a
per-leaf square-sum tree reduction.

Semantics match ``optax.chain(optax.clip_by_global_norm(c), optax.adam(lr,
eps=...))`` exactly (bias-corrected moments; see tests/test_optim.py).

Single-chip / dp-replicated use only: under mp tensor sharding, raveling
sharded params would force an all-gather — callers keep plain optax there
(rl/ppo_mae.py chooses by mesh).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.flatten_util  # explicit: optax/flax importing it transitively is fragile
import jax.numpy as jnp
import optax


class FlatAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    mu: jnp.ndarray  # first moment, flat
    nu: jnp.ndarray  # second moment, flat


def flat_adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """One-buffer Adam (+optional global-norm clip), drop-in for an
    ``optax.chain(clip_by_global_norm, adam)`` over an all-fp32 pytree."""

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        # mu/nu must be DISTINCT buffers: callers donate the whole opt state
        # into jitted updates, and aliased leaves fail the donation check
        return FlatAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
        )

    def update(grads, state, params=None):
        del params
        g, unravel = jax.flatten_util.ravel_pytree(grads)
        if max_grad_norm is not None:
            gnorm = jnp.sqrt(jnp.sum(jnp.square(g)))
            g = g * jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * jnp.square(g)
        t = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**t)
        nu_hat = nu / (1.0 - b2**t)
        # optax's scale_by_learning_rate evaluates a schedule at the
        # PRE-increment count (first update sees schedule(0))
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        step = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(step), FlatAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    mu: jnp.ndarray  # first moment, flat
    nu: jnp.ndarray  # second moment, flat
    wd_mask: jnp.ndarray  # flat 0/1 decay mask (decay only >=2-D params)


def flat_adamw(
    learning_rate,
    weight_decay,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """One-buffer AdamW with the reference's WD split (decay only >=2-D
    params, mae.py:167-176), drop-in for ``optax.adamw(..., mask=wd_mask)``.
    ``learning_rate`` and ``weight_decay`` may be scalars or schedules
    (evaluated at the PRE-increment count, matching optax). Requires params
    at update time (AdamW). Single-chip / dp-replicated use only — see the
    module docstring."""

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        mask, _ = jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda p: jnp.full(p.shape, float(jnp.ndim(p) >= 2), p.dtype), params)
        )
        return FlatAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
            wd_mask=mask,
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("flat_adamw requires params (AdamW weight decay)")
        g, unravel = jax.flatten_util.ravel_pytree(grads)
        p, _ = jax.flatten_util.ravel_pytree(params)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * jnp.square(g)
        t = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**t)
        nu_hat = nu / (1.0 - b2**t)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        wd = weight_decay(state.count) if callable(weight_decay) else weight_decay
        step = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * state.wd_mask * p)
        return unravel(step), FlatAdamWState(count=count, mu=mu, nu=nu, wd_mask=state.wd_mask)

    return optax.GradientTransformation(init, update)
