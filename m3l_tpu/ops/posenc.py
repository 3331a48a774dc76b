"""Sinusoidal positional tables.

Two families are used across the framework:

* :func:`sincos_2d` — the 2-D sin/cos table with interleaved sin/cos pairs and
  an x-block followed by a y-block, matching the layout produced by the
  ``positional_encodings.PositionalEncoding2D`` module the reference relies on
  (reference usage: models/pretrain_models.py:120-140). The table is a pure
  function of (height, width, channels) — computed once at model init, baked
  into the jitted graph as a constant.

* :func:`sincos_nd` — the DINOv2-style n-D sinusoidal embedding with
  ``10000**-linspace`` frequency bands used by the extended VTT / ViT zoo
  (reference: tactile_ssl/model/layers/patch_embed.py:133-229 SinusoidalEmbed).

All tables are returned as float32 numpy-backed jnp arrays; callers cast to
their compute dtype.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _interleaved_sincos(pos: np.ndarray, inv_freq: np.ndarray) -> np.ndarray:
    """stack(sin, cos) interleaved over the last axis: (P, 2*F)."""
    ang = np.einsum("i,j->ij", pos, inv_freq)  # (P, F)
    emb = np.stack([np.sin(ang), np.cos(ang)], axis=-1)  # (P, F, 2)
    return emb.reshape(ang.shape[0], -1)  # (P, 2F) interleaved


def sincos_2d(height: int, width: int, channels: int) -> jnp.ndarray:
    """2-D sinusoidal table of shape (height*width, channels).

    Layout contract (PositionalEncoding2D-compatible):
      - ``ch = ceil(channels/4)*2`` sub-channels per axis,
      - ``inv_freq = 1/10000**(arange(0, ch, 2)/ch)``,
      - first ``ch`` output channels hold the x-axis (row) embedding,
        broadcast over columns; the next ``ch`` hold the y-axis (column)
        embedding broadcast over rows; output truncated to ``channels``.
      - sin/cos interleaved within each axis block.

    Rows are flattened row-major: index = row*width + col, matching
    ``flatten(1, 2)`` on a (B, H, W, C) grid.
    """
    ch = int(np.ceil(channels / 4) * 2)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, ch, 2, dtype=np.float64) / ch))
    emb_x = _interleaved_sincos(np.arange(height, dtype=np.float64), inv_freq)  # (H, ch)
    emb_y = _interleaved_sincos(np.arange(width, dtype=np.float64), inv_freq)  # (W, ch)
    out = np.zeros((height, width, 2 * ch), dtype=np.float64)
    out[:, :, :ch] = emb_x[:, None, :]
    out[:, :, ch : 2 * ch] = emb_y[None, :, :]
    out = out[:, :, :channels].reshape(height * width, channels)
    return jnp.asarray(out, dtype=jnp.float32)


def sincos_nd(grid_shape: tuple[int, ...], dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """n-D sinusoidal embedding over an arbitrary grid, (prod(grid), dim).

    Per-axis allocation: each of the ``n`` axes receives ``dim // n`` channels
    (the remainder is zero-padded at the end), with each axis block holding
    ``sin`` of the scaled position in its first half and ``cos`` in its second
    half; frequency bands are ``temperature ** -linspace(0, 1, block//2)``.

    This is the SinusoidalEmbed contract used by the DINO-era VTT/ViT models
    (reference: tactile_ssl/model/layers/patch_embed.py:133-229).
    """
    n_axes = len(grid_shape)
    block = (dim // n_axes) // 2 * 2  # even per-axis block
    if block < 2:
        raise ValueError(f"dim {dim} too small for {n_axes} axes")
    half = block // 2
    freqs = temperature ** (-np.linspace(0.0, 1.0, half, dtype=np.float64))
    mesh = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in grid_shape], indexing="ij")
    out = np.zeros((int(np.prod(grid_shape)), dim), dtype=np.float64)
    for ax, pos in enumerate(mesh):
        ang = pos.reshape(-1)[:, None] * freqs[None, :]  # (P, half)
        out[:, ax * block : ax * block + half] = np.sin(ang)
        out[:, ax * block + half : (ax + 1) * block] = np.cos(ang)
    return jnp.asarray(out, dtype=jnp.float32)


def learned_like_sincos_shape(num_patches: int, dim: int) -> tuple[int, int]:
    """Shape helper for a learned positional-embedding parameter that mirrors
    the reference's ``pos_embedding`` layout (1 + num_patches rows; row 0 is a
    legacy CLS slot that the multimodal models skip — reference:
    models/pretrain_models.py:781, usage at :219)."""
    return (num_patches + 1, dim)
