"""Observation -> model input packing.

``vt_load`` is the canonical obs->model contract of the whole framework,
replicating the reference's ``utils/pretrain_utils.py:7-57`` semantics with a
TPU-first NHWC output layout:

* ``image``: (..., H, W, 3*fs) float in [0, 1] (reference normalization
  [0, 1] is the identity), channel order frame-major RGB triplets
  [f0·rgb, f1·rgb, ...].
* ``tactile``: the env emits an interleaved channel-first stack
  (B, fs*C, H, W) with C = 3*num_sensors channels per frame; the packing
  de-interleaves per sensor into ``tactile1..N`` of shape (..., H, W, 3*fs)
  with the same frame-major channel order, then maps [-1, 1] -> [0, 1]
  (reference :33-51).

Also handles the 5-D stacked layouts produced by FrameStack before packing,
exactly as the reference's extractors do (reference
models/pretrain_models.py:823-827):
* image (B, fs, H, W, 3)  -> (B, H, W, fs*3)
* tactile (B, fs, C, H, W) -> (B, fs*C, H, W)

The function is pure jnp and can run inside ``jit`` — on TPU the packing
fuses with the first conv/patchify so there is no host-side tensor building
(the reference pays a per-minibatch CPU deepcopy + torch.Tensor cost,
ppo_mae.py:258-260).
"""
from __future__ import annotations

import jax.numpy as jnp


def vt_load(
    x: dict,
    frame_stack: int = 1,
    image_normalization=(0.0, 1.0),
    tactile_normalization=(-1.0, 1.0),
) -> dict:
    out: dict = {}
    if "image" in x:
        img = jnp.asarray(x["image"])
        if img.ndim == 3:
            img = img[None]
        if img.ndim == 5:  # (B, fs, H, W, 3) -> (B, H, W, fs*3)
            b, fs, h, w, c = img.shape
            img = img.transpose(0, 2, 3, 1, 4).reshape(b, h, w, fs * c)
        assert img.shape[-1] == 3 * frame_stack, f"image channels {img.shape[-1]} != 3*frame_stack"
        if img.dtype == jnp.uint8:
            # TPU-first storage: rollout buffers keep images uint8 in HBM;
            # dequantization fuses into the first conv/patchify under jit.
            img = img.astype(jnp.float32) / 255.0
        lo, hi = image_normalization
        out["image"] = (img.astype(jnp.float32) - lo) / (hi - lo)

    if "tactile" in x:
        tac = jnp.asarray(x["tactile"])
        if tac.ndim == 3:
            tac = tac[None]
        if tac.ndim == 5:  # (B, fs, C, H, W) -> (B, fs*C, H, W)
            b, fs, c, h, w = tac.shape
            tac = tac.reshape(b, fs * c, h, w)
        per_frame = tac.shape[1] // frame_stack
        assert per_frame * frame_stack == tac.shape[1] and per_frame % 3 == 0, (
            f"tactile channels {tac.shape[1]} not divisible into 3-channel sensors x frame_stack {frame_stack}"
        )
        n_sensors = per_frame // 3
        lo, hi = tactile_normalization
        # de-interleave: sensor k, frame f lives at channels f*per_frame + 3k + {0,1,2}
        base = jnp.arange(frame_stack)[:, None] * per_frame + jnp.arange(3)[None, :]  # (fs, 3)
        base = base.reshape(-1)  # frame-major triplets
        for k in range(n_sensors):
            sel = tac[:, base + 3 * k]  # (B, 3*fs, H, W)
            sel = sel.transpose(0, 2, 3, 1)  # NHWC
            out[f"tactile{k + 1}"] = (sel.astype(jnp.float32) - lo) / (hi - lo)

    for key in x:
        if key.startswith("tactile") and key != "tactile":
            t = jnp.asarray(x[key])
            lo, hi = tactile_normalization
            out[key] = (t.astype(jnp.float32) - lo) / (hi - lo)
    return out
