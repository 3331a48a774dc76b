"""PPO-learnability check for TouchPress-v0 from the raw 4-d state (CPU).

The middle rung of the TouchPress experimental ladder:

  1. scripts/touchpress_laws.py — a memoryless linear law in the touch
     reading solves the task (return ceiling ~-3); the best vision-only law
     plateaus ~-51.
  2. THIS SCRIPT — vanilla PPO with a tiny MLP on the raw state
     [plate_q, finger_q, finger_qvel, force] learns the task, i.e. the
     reward/discount/exploration design is PPO-learnable at all (the
     round-3 redesign: in-contact random-F0 start + reward clip at the
     no-contact floor). Runs in minutes on the 1-core CPU host — no
     renderer, no TPU — so it de-risks the expensive pixel runs.
  3. cli/train.py --env MuJoCoPixels/TouchPress-v0 — the real ablation
     arms (vision_and_touch vs vision) through the full MAE+PPO pipeline.

Run: JAX_PLATFORMS=cpu python scripts/touchpress_state_ppo.py
     (--blind_touch zeroes the force channel: the vision-arm analogue —
      expect a plateau near the vision-law ceiling, NOT the touch ceiling.)

Result (2026-08-18, 400k steps, 16 envs, ~50 s on the 1-core CPU host):
  touch visible : ep_rew_mean -1.59  (beats the scripted T-int ceiling -2.8;
                  PPO tunes the gain per-state better than a fixed c)
  touch blinded : ep_rew_mean -37.58 plateau (better than the fixed-
                  deflection law's -51 — PPO finds a smarter proprioceptive
                  strategy — but still pays the hidden-gain spread; 24x gap)
The blinded arm sees EXACT joint positions, strictly more than the camera
shows, so the pixel vision-only arm's ceiling is at least as bad.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from m3l_tpu.envs.touch_press import TouchPressEnv

OBS_SCALE = np.array([10.0, 10.0, 1.0, 0.25], np.float32)  # qpos, qpos, qvel, F


def init_params(key, obs_dim=4, hidden=64):
    ks = jax.random.split(key, 6)
    g = jax.nn.initializers.orthogonal
    p = {
        "pi1": (g(np.sqrt(2))(ks[0], (obs_dim, hidden)), jnp.zeros(hidden)),
        "pi2": (g(np.sqrt(2))(ks[1], (hidden, hidden)), jnp.zeros(hidden)),
        "pim": (g(0.01)(ks[2], (hidden, 1)), jnp.zeros(1)),
        "v1": (g(np.sqrt(2))(ks[3], (obs_dim, hidden)), jnp.zeros(hidden)),
        "v2": (g(np.sqrt(2))(ks[4], (hidden, hidden)), jnp.zeros(hidden)),
        "vh": (g(1.0)(ks[5], (hidden, 1)), jnp.zeros(1)),
        "logstd": jnp.zeros(1) - 0.5,
    }
    return p


def policy(p, obs):
    h = jnp.tanh(obs @ p["pi1"][0] + p["pi1"][1])
    h = jnp.tanh(h @ p["pi2"][0] + p["pi2"][1])
    mean = h @ p["pim"][0] + p["pim"][1]
    hv = jnp.tanh(obs @ p["v1"][0] + p["v1"][1])
    hv = jnp.tanh(hv @ p["v2"][0] + p["v2"][1])
    value = (hv @ p["vh"][0] + p["vh"][1])[..., 0]
    return mean, p["logstd"], value


@jax.jit
def act(p, obs, key):
    mean, logstd, value = policy(p, obs)
    noise = jax.random.normal(key, mean.shape)
    a = mean + jnp.exp(logstd) * noise
    logp = (-0.5 * ((a - mean) / jnp.exp(logstd)) ** 2 - logstd - 0.5 * np.log(2 * np.pi)).sum(-1)
    return a, logp, value


def gae(rews, vals, last_val, gamma=0.98, lam=0.95):
    T = rews.shape[0]
    adv = np.zeros_like(rews)
    last = 0.0
    nxt = last_val
    for t in range(T - 1, -1, -1):
        delta = rews[t] + gamma * nxt - vals[t]
        last = delta + gamma * lam * last
        adv[t] = last
        nxt = vals[t]
    return adv, adv + vals


@partial(jax.jit, static_argnames=("tx_update", "n_epochs", "n_mb"))
def ppo_update(p, opt_state, tx_update, batch, key, n_epochs=10, n_mb=4,
               clip=0.2, vf_coef=0.5, ent_coef=0.0):
    obs, acts, logps, advs, rets = batch
    N = obs.shape[0]

    def loss_fn(params, idx):
        o, a, lp_old, ad, rt = (x[idx] for x in (obs, acts, logps, advs, rets))
        mean, logstd, v = policy(params, o)
        lp = (-0.5 * ((a - mean) / jnp.exp(logstd)) ** 2 - logstd - 0.5 * np.log(2 * np.pi)).sum(-1)
        ratio = jnp.exp(lp - lp_old)
        ad = (ad - ad.mean()) / (ad.std() + 1e-8)
        pg = -jnp.minimum(ratio * ad, jnp.clip(ratio, 1 - clip, 1 + clip) * ad).mean()
        vloss = 0.5 * ((v - rt) ** 2).mean()
        ent = (logstd + 0.5 * np.log(2 * np.pi * np.e)).sum()
        return pg + vf_coef * vloss - ent_coef * ent

    def epoch(carry, ek):
        params, ostate = carry
        perm = jax.random.permutation(ek, N)

        def mb(carry2, mb_idx):
            params2, ostate2 = carry2
            idx = jax.lax.dynamic_slice_in_dim(perm, mb_idx * (N // n_mb), N // n_mb)
            g = jax.grad(loss_fn)(params2, idx)
            upd, ostate2 = tx_update(g, ostate2, params2)
            return (optax.apply_updates(params2, upd), ostate2), 0.0

        (params, ostate), _ = jax.lax.scan(mb, (params, ostate), jnp.arange(n_mb))
        return (params, ostate), 0.0

    (p, opt_state), _ = jax.lax.scan(epoch, (p, opt_state), jax.random.split(key, n_epochs))
    return p, opt_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blind_touch", action="store_true", help="zero the force channel (vision-arm analogue)")
    ap.add_argument("--total_steps", type=int, default=400_000)
    ap.add_argument("--n_envs", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    envs = [TouchPressEnv() for _ in range(args.n_envs)]
    rng = np.random.default_rng(args.seed)
    obs = np.stack([e.reset(seed=int(rng.integers(2**31)))[0] for e in envs]) * OBS_SCALE

    key = jax.random.PRNGKey(args.seed)
    p = init_params(key)
    tx = optax.adam(3e-4)
    opt_state = tx.init(p)

    T = TouchPressEnv.HORIZON  # rollout = one full episode per env
    iters = args.total_steps // (T * args.n_envs)
    ep_rets, t0 = [], time.time()
    for it in range(iters):
        ob_buf = np.zeros((T, args.n_envs, 4), np.float32)
        a_buf = np.zeros((T, args.n_envs, 1), np.float32)
        lp_buf = np.zeros((T, args.n_envs), np.float32)
        r_buf = np.zeros((T, args.n_envs), np.float32)
        v_buf = np.zeros((T, args.n_envs), np.float32)
        cur_ret = np.zeros(args.n_envs)
        for t in range(T):
            o = obs.copy()
            if args.blind_touch:
                o[:, 3] = 0.0
            key, k1 = jax.random.split(key)
            a, lp, v = act(p, jnp.asarray(o), k1)
            a, lp, v = np.asarray(a), np.asarray(lp), np.asarray(v)
            ob_buf[t], a_buf[t], lp_buf[t], v_buf[t] = o, a, lp, v
            for i, e in enumerate(envs):
                s, r, _, trunc, info = e.step(np.clip(a[i], -1, 1))
                r_buf[t, i] = r
                cur_ret[i] += r
                if trunc:
                    ep_rets.append(cur_ret[i])
                    cur_ret[i] = 0.0
                    s, _ = e.reset(seed=int(rng.integers(2**31)))
                obs[i] = s * OBS_SCALE
        adv = np.zeros_like(r_buf)
        ret = np.zeros_like(r_buf)
        for i in range(args.n_envs):
            adv[:, i], ret[:, i] = gae(r_buf[:, i], v_buf[:, i], 0.0)  # episode-aligned: bootstrap 0 at truncation is biased but tiny (gamma^100)
        batch = tuple(jnp.asarray(x.reshape(T * args.n_envs, *x.shape[2:]))
                      for x in (ob_buf, a_buf, lp_buf, adv, ret))
        key, k2 = jax.random.split(key)
        p, opt_state = ppo_update(p, opt_state, tx.update, batch, k2)
        if it % 10 == 0 or it == iters - 1:
            recent = float(np.mean(ep_rets[-5 * args.n_envs:])) if ep_rets else float("nan")
            print(f"[it {it:4d}] steps={(it+1)*T*args.n_envs:7d} ep_rew_mean={recent:8.2f} "
                  f"logstd={float(p['logstd'][0]):+.2f} elapsed={time.time()-t0:.0f}s", flush=True)
    final = float(np.mean(ep_rets[-10 * args.n_envs:]))
    print(f"FINAL ep_rew_mean(last10xN)={final:.2f} blind_touch={args.blind_touch}")


if __name__ == "__main__":
    main()
