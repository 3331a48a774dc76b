"""Patchify / unpatchify for NHWC images.

TPU-first layout note: the framework keeps images NHWC end-to-end (the
preferred conv/layout on TPU); the reference is NCHW torch. The per-patch
flattening order is kept identical to the reference's
``Rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)')``
(reference: models/pretrain_models.py:768,775): within a patch the layout is
(row, col, channel) — channel-fastest — so reconstruction losses are directly
comparable across frameworks given the same weights.
"""
from __future__ import annotations

import jax.numpy as jnp


def patchify(x: jnp.ndarray, patch_h: int, patch_w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, (H/ph)*(W/pw), ph*pw*C), patch layout (p1 p2 c)."""
    b, h, w, c = x.shape
    gh, gw = h // patch_h, w // patch_w
    x = x.reshape(b, gh, patch_h, gw, patch_w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b gh gw p1 p2 c
    return x.reshape(b, gh * gw, patch_h * patch_w * c)


def unpatchify(p: jnp.ndarray, grid_h: int, grid_w: int, patch_h: int, patch_w: int, channels: int) -> jnp.ndarray:
    """Inverse of :func:`patchify`: (B, N, ph*pw*C) -> (B, H, W, C)."""
    b = p.shape[0]
    x = p.reshape(b, grid_h, grid_w, patch_h, patch_w, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, grid_h * patch_h, grid_w * patch_w, channels)
