"""Generalized Advantage Estimation (device-side, lax.scan).

Matches SB3's ``RolloutBuffer.compute_returns_and_advantage`` semantics (the
reference relies on SB3's implementation; see SURVEY.md §7 "SB3 semantic
parity"): episode_starts-shifted bootstrapping, with the final step
bootstrapped from ``last_values`` masked by ``last_dones``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,  # (T, E)
    values: jnp.ndarray,  # (T, E)
    episode_starts: jnp.ndarray,  # (T, E) float: 1.0 if a new episode starts at t
    last_values: jnp.ndarray,  # (E,)
    last_dones: jnp.ndarray,  # (E,) float: 1.0 if env done after final step
    gamma: float,
    gae_lambda: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, returns), each (T, E)."""
    t_len = rewards.shape[0]

    def step(carry, xs):
        last_gae, next_values, next_non_terminal = carry
        r, v, _ = xs
        delta = r + gamma * next_values * next_non_terminal - v
        last_gae = delta + gamma * gae_lambda * next_non_terminal * last_gae
        # for step t-1, "next" becomes this step
        new_non_terminal = 1.0 - xs[2]  # episode_starts[t] tells if t started fresh
        return (last_gae, v, new_non_terminal), last_gae

    init = (
        jnp.zeros_like(last_values),
        last_values,
        1.0 - last_dones.astype(values.dtype),
    )
    xs = (rewards, values, episode_starts.astype(values.dtype))
    (_, _, _), adv_rev = jax.lax.scan(step, init, xs, reverse=True)
    returns = adv_rev + values
    return adv_rev, returns
