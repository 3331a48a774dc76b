"""Serving-latency benchmark: the exported StableHLO policy artifact on the
real chip.

The reference has no serving story (its live demo re-runs the torch module
in-process, tactile_ssl/test/demo_t1_forcefield.py:24-182); m3l_tpu/serve.py
adds AOT export. This bench publishes the numbers a deployment actually
cares about, measured THROUGH the deployed artifact (``jax.export``
deserialize -> ``.call`` under jit), not the in-process module:

* **on-chip step time** — a ``lax.scan`` chain of K policy steps over K
  DISTINCT pre-staged observations (loop-carried dependence prevents
  hoisting/CSE), one dispatch, one readback: per-step device time with the
  host out of the picture. This is the serving-relevant number on a
  production-attached TPU.
* **single-dispatch latency** — p50/p90 of one ``.call`` + scalar readback
  per step. On THIS environment's tunneled chip it is dominated by the
  relay's ~34 ms RTT (BASELINE.md "relay dispatch cost"), so it upper-bounds
  rather than represents direct-attached latency; reported for honesty.
* **batch scaling** — amortized per-dispatch time and obs-frames/s at
  serving batch sizes 1/8/64 (the flagship policy is tiny next to the MXU,
  so batch-1 serving wastes the chip; the table shows what batching buys).

Flagship policy config (reference train.py defaults): dim 256, depth 4,
frame_stack 4, bf16 compute. Weights are random — latency is
weight-independent.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_policy(dtype, frame_stack=4, action_dim=3):
    from flax import nnx

    from m3l_tpu.models import VTT, VTMAE, VTTConfig
    from m3l_tpu.rl import ActorCritic, MAEFeatures

    rngs = nnx.Rngs(0)
    cfg = VTTConfig(dim=256, depth=4, heads=4, mlp_dim=512, num_tactiles=2, frame_stack=frame_stack)
    mae = VTMAE(
        VTT(cfg, dtype=dtype, rngs=rngs),
        decoder_dim=256,
        masking_ratio=0.95,
        decoder_depth=3,
        decoder_heads=4,
        early_conv_masking=True,
        dtype=dtype,
        rngs=rngs,
    )
    feats = MAEFeatures(mae, cfg.dim, frame_stack=frame_stack, dtype=dtype, rngs=rngs)
    return ActorCritic(feats, cfg.dim, action_dim, dtype=dtype, rngs=rngs)


def raw_obs(batch, frame_stack=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.integers(0, 256, (batch, frame_stack, 64, 64, 3), dtype=np.uint8),
        "tactile": rng.uniform(-1, 1, (batch, frame_stack, 6, 32, 32)).astype(np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=256, help="scan length for amortized on-chip step time")
    ap.add_argument("--latency_reps", type=int, default=30)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8, 64])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from m3l_tpu import serve

    print(f"devices: {jax.devices()}", file=sys.stderr)
    policy = build_policy(jnp.bfloat16)

    results = {}

    # ------------------------------------------------------------------ #
    # 1) amortized on-chip step time via a K-step scan over the ARTIFACT
    # ------------------------------------------------------------------ #
    K = args.chain
    exported1 = jexport.deserialize(serve.export_policy(policy, raw_obs(1)))

    obs_chain = {
        "image": np.stack([raw_obs(1, seed=i)["image"] for i in range(K)]),
        "tactile": np.stack([raw_obs(1, seed=i)["tactile"] for i in range(K)]),
    }

    @jax.jit
    def chain(obs_seq):
        def body(carry, obs):
            a = exported1.call(obs)
            return carry + a.sum(), ()

        total, _ = jax.lax.scan(body, jnp.float32(0.0), obs_seq)
        return total

    staged = jax.device_put(obs_chain)
    t = float(chain(staged))  # compile + warm (real readback)
    t0 = time.time()
    t = float(chain(staged))
    chain_s = time.time() - t0
    step_us = chain_s / K * 1e6
    results["onchip_step_us_b1"] = round(step_us, 1)
    print(f"on-chip step time (batch 1, K={K} chained): {step_us:.0f} us/step "
          f"({K / chain_s:,.0f} policy steps/s single-stream)", file=sys.stderr)

    # ------------------------------------------------------------------ #
    # 2) single-dispatch latency (relay RTT included — see docstring)
    # ------------------------------------------------------------------ #
    call1 = jax.jit(exported1.call)
    obs1 = jax.device_put(raw_obs(1, seed=123))
    float(call1(obs1).sum())  # warm
    lats = []
    for _ in range(args.latency_reps):
        t0 = time.time()
        float(call1(obs1).sum())
        lats.append((time.time() - t0) * 1e3)
    lats.sort()
    p50 = lats[len(lats) // 2]
    p90 = lats[int(len(lats) * 0.9)]
    results["dispatch_latency_ms_p50"] = round(p50, 1)
    results["dispatch_latency_ms_p90"] = round(p90, 1)
    print(f"single-dispatch latency (relay-attached): p50 {p50:.1f} ms, p90 {p90:.1f} ms", file=sys.stderr)

    # ------------------------------------------------------------------ #
    # 3) batch scaling (per-dispatch, sequential dispatches)
    # ------------------------------------------------------------------ #
    for b in args.batches:
        exported = exported1 if b == 1 else jexport.deserialize(serve.export_policy(policy, raw_obs(b)))
        callb = jax.jit(exported.call)
        obsb = jax.device_put(raw_obs(b, seed=7))
        float(callb(obsb).sum())  # warm
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            float(callb(obsb).sum())
        dt = (time.time() - t0) / reps
        fps = b * 4 / dt  # frame_stack 4 obs-frames per sample
        results[f"batch{b}_dispatch_ms"] = round(dt * 1e3, 1)
        results[f"batch{b}_obs_frames_per_s"] = round(fps, 0)
        print(f"batch {b:3d}: {dt * 1e3:6.1f} ms/dispatch  ->  {fps:10,.0f} obs-frames/s", file=sys.stderr)

    print(json.dumps({"metric": "serving_policy_bench", **results}))


if __name__ == "__main__":
    main()
