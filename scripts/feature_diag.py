"""Frozen-feature diagnosis for the texture-transfer arms (VERDICT r3 #4b).

Quantifies WHY each SSL representation transfers (or fails) on the texture
probe, without training anything: encode the held-out test split with each
frozen encoder (random / mae / dino / dinov2 / ijepa checkpoints from
runs/transfer_texture) and measure

  1. effective rank (participation ratio) of the pooled-feature covariance
     — a collapse detector: PR ~ 1-3 means the encoder maps everything to a
     few directions (I-JEPA collapse hypothesis);
  2. cosine-similarity structure: mean pairwise similarity within the same
     EPISODE vs same TEXTURE (different episode) vs different texture.
     The episode-identity hypothesis for DINO predicts
     sim(same-episode) >> sim(same-texture) ~= sim(different-texture);
     a texture-bearing representation predicts
     sim(same-texture) - sim(diff-texture) >> 0.

Reference context: tactile_ssl/algorithm/{dino,dinov2,ijepa,mae}.py train
these encoders; downstream_task/textile_sl.py:73-209 is the probe whose
failure this explains.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/feature_diag.py \
      --out runs/transfer_texture
"""
from __future__ import annotations

import argparse
import functools
import json
import os

import numpy as np


def windowed_with_traj(data: dict, num_frames: int = 2, stride: int = 1):
    """Same windowing as data.synthetic.windowed_probe_samples but keeps
    traj_id (that helper drops it; the episode-vs-texture split needs it)."""
    frames, tid = data["frames"], data["traj_id"]
    span = (num_frames - 1) * stride
    idx = np.arange(span, len(frames))
    idx = idx[tid[idx] == tid[idx - span]]
    windows = np.concatenate([frames[idx - span + j * stride] for j in range(num_frames)], axis=-1)
    return windows, data["textile"][idx], tid[idx]


def effective_rank(feats: np.ndarray) -> float:
    """Participation ratio (sum lambda)^2 / sum lambda^2 of the feature
    covariance — D for isotropic features, ~1 under collapse."""
    x = feats - feats.mean(0, keepdims=True)
    lam = np.linalg.svd(x, compute_uv=False) ** 2
    return float(lam.sum() ** 2 / (lam**2).sum())


def sim_structure(feats: np.ndarray, tex: np.ndarray, tid: np.ndarray):
    """Mean cosine similarity within same-episode / same-texture(diff-ep) /
    different-texture pairs."""
    f = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-8)
    sim = f @ f.T
    same_ep = tid[:, None] == tid[None, :]
    same_tex = tex[:, None] == tex[None, :]
    off = ~np.eye(len(f), dtype=bool)
    return {
        "sim_same_episode": float(sim[same_ep & off].mean()),
        "sim_same_texture_diff_episode": float(sim[same_tex & ~same_ep].mean()),
        "sim_diff_texture": float(sim[~same_tex].mean()),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/transfer_texture")
    p.add_argument("--n_samples", type=int, default=1536)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from m3l_tpu.data.synthetic import synth_digit_trajectories
    from m3l_tpu.ssl.module import as_float_image
    from m3l_tpu.tasks.sl_module import load_encoder_from_checkpoint
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from transfer_experiment import as_video, build_encoder, build_video_encoder  # same archs as the arms

    # test split: SAME generator call as transfer_experiment.py (seed=3)
    raw = synth_digit_trajectories(60, 50, seed=3, textures=6)
    windows, tex, tid = windowed_with_traj(raw, 2)
    step = max(1, len(windows) // args.n_samples)
    sel = np.arange(0, len(windows), step)[: args.n_samples]
    windows, tex, tid = windows[sel], tex[sel], tid[sel]
    # pad to a multiple of batch so every chunk compiles at ONE static shape
    pad = (-len(windows)) % args.batch
    n_real = len(windows)
    if pad:
        windows = np.concatenate([windows, windows[:pad]], 0)
    print(f"[diag] {n_real} windows ({len(np.unique(tid))} episodes, {len(np.unique(tex))} textures)")

    arms = {
        "random": (None, "mae"),
        "mae": (os.path.join(args.out, "ssl_mae/last.ckpt"), "mae"),
        "dino": (os.path.join(args.out, "ssl_dino/last.ckpt"), "dino"),
        "dinov2": (os.path.join(args.out, "ssl_dinov2/last.ckpt"), "dino"),
        "ijepa": (os.path.join(args.out, "ssl_ijepa/last.ckpt"), "jepa"),
        "vjepa": (os.path.join(args.out, "ssl_vjepa/last.ckpt"), "jepa"),
    }

    results = {}
    for name, (ckpt, enc_type) in arms.items():
        if ckpt is not None and not os.path.exists(ckpt):
            print(f"[diag] skip {name}: no {ckpt}")
            continue
        # probes build the encoder with rngs 42 — match the random arm exactly
        is_video = name == "vjepa"
        encoder = (build_video_encoder if is_video else build_encoder)(nnx.Rngs(42), jnp.bfloat16)
        if ckpt is not None:
            load_encoder_from_checkpoint(encoder, ckpt, enc_type)
        gdef, state = nnx.split(encoder)

        @functools.partial(jax.jit, static_argnums=())
        def encode(state, x):
            enc = nnx.merge(gdef, state)
            xf = as_float_image(x)
            if is_video:
                xf = as_video(xf)
            toks = enc.forward_features(xf)["x_norm_patchtokens"]
            return jnp.mean(toks.astype(jnp.float32), axis=1)

        chunks = []
        for i in range(0, len(windows), args.batch):
            out = encode(state, jnp.asarray(windows[i : i + args.batch]))
            chunks.append(np.asarray(out))  # device->host sync per chunk
        feats = np.concatenate(chunks, 0)[:n_real]
        r = {"effective_rank": round(effective_rank(feats), 2), "feature_std": round(float(feats.std()), 5)}
        r.update({k: round(v, 4) for k, v in sim_structure(feats, tex, tid).items()})
        r["texture_margin"] = round(r["sim_same_texture_diff_episode"] - r["sim_diff_texture"], 4)
        r["episode_excess"] = round(r["sim_same_episode"] - r["sim_same_texture_diff_episode"], 4)
        results[name] = r
        print(f"[diag] {name}: {json.dumps(r)}")

    path = os.path.join(args.out, "feature_diag.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[diag] wrote {path}")

    cols = ["effective_rank", "sim_same_episode", "sim_same_texture_diff_episode", "sim_diff_texture", "texture_margin", "episode_excess"]
    print("| arm | " + " | ".join(cols) + " |")
    print("|---|" + "---|" * len(cols))
    for name, r in results.items():
        print(f"| {name} | " + " | ".join(str(r[c]) for c in cols) + " |")


if __name__ == "__main__":
    main()
