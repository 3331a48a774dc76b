import numpy as np
import jax.numpy as jnp

from m3l_tpu.rl.gae import compute_gae
from m3l_tpu.rl.vecnorm import RewardNormalizer


def reference_gae(rewards, values, episode_starts, last_values, last_dones, gamma, lam):
    """Numpy transliteration of SB3 compute_returns_and_advantage."""
    t_len, _ = rewards.shape
    adv = np.zeros_like(rewards)
    last_gae = 0.0
    for step in reversed(range(t_len)):
        if step == t_len - 1:
            next_non_terminal = 1.0 - last_dones
            next_values = last_values
        else:
            next_non_terminal = 1.0 - episode_starts[step + 1]
            next_values = values[step + 1]
        delta = rewards[step] + gamma * next_values * next_non_terminal - values[step]
        last_gae = delta + gamma * lam * next_non_terminal * last_gae
        adv[step] = last_gae
    return adv, adv + values


def test_gae_matches_sb3_semantics():
    rng = np.random.default_rng(0)
    t, e = 32, 4
    rewards = rng.normal(size=(t, e)).astype(np.float32)
    values = rng.normal(size=(t, e)).astype(np.float32)
    episode_starts = (rng.random((t, e)) < 0.1).astype(np.float32)
    last_values = rng.normal(size=e).astype(np.float32)
    last_dones = (rng.random(e) < 0.3).astype(np.float32)
    adv_ref, ret_ref = reference_gae(rewards, values, episode_starts, last_values, last_dones, 0.99, 0.95)
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(episode_starts),
        jnp.asarray(last_values), jnp.asarray(last_dones), 0.99, 0.95,
    )
    np.testing.assert_allclose(np.asarray(adv), adv_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_ref, rtol=1e-5, atol=1e-5)


def test_reward_normalizer_matches_vecnormalize():
    """Numpy transliteration of SB3 VecNormalize(norm_obs=False) reward path."""
    rng = np.random.default_rng(1)
    n_envs, gamma = 3, 0.99
    norm = RewardNormalizer(n_envs, gamma=gamma)
    # independent reference
    returns = np.zeros(n_envs)
    mean, var, count = 0.0, 1.0, 1e-4
    for _ in range(50):
        rewards = rng.normal(size=n_envs) * 5
        dones = rng.random(n_envs) < 0.1
        out = norm(rewards.copy(), dones)
        returns = returns * gamma + rewards
        b_mean, b_var, b_n = returns.mean(), returns.var(), n_envs
        delta = b_mean - mean
        tot = count + b_n
        mean = mean + delta * b_n / tot
        m2 = var * count + b_var * b_n + delta**2 * count * b_n / tot
        var, count = m2 / tot, tot
        expected = np.clip(rewards / np.sqrt(var + 1e-8), -10, 10)
        returns[dones] = 0.0
        np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_reward_normalizer_disabled_passthrough():
    norm = RewardNormalizer(2, enabled=False)
    r = np.array([1.0, -2.0], np.float32)
    np.testing.assert_array_equal(norm(r, np.zeros(2, bool)), r)
