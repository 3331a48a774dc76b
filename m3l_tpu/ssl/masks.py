"""Vectorized, static-shape mask samplers.

The reference samples block masks with per-sample Python ``while`` loops and
truncates every mask to the batch minimum length (reference
tactile_ssl/algorithm/dino.py:211-327, dinov2.py:260-341, ijepa.py:137-296)
— host-side, dynamic shapes, a known hot spot (SURVEY.md §3 hot-loop #4).

TPU redesign (SURVEY.md §7 hard-part #4): masks are boolean (M, B, N) arrays
produced by pure vectorized ops under the same distribution family —
* block area ~ U(scale_min, scale_max) sampled once per call (the reference
  also fixes one block size per call, dino.py:274-279),
* block top-left corners uniform per (mask, sample),
* global masks optionally constrained to the complement of the local masks;
  if the constrained region is smaller than ``min_keep`` the unconstrained
  block is used for that sample (the reference instead retries/relaxes in a
  host loop — same intent, deterministic compile).
Consumers run the encoder at full static length with attention key-masking.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _block_mask(top, left, h, w, grid_h, grid_w):
    """(..., grid_h*grid_w) bool block mask from traced corner/size scalars."""
    rows = jnp.arange(grid_h)
    cols = jnp.arange(grid_w)
    rmask = (rows[None, :] >= top[..., None]) & (rows[None, :] < (top + h)[..., None])
    cmask = (cols[None, :] >= left[..., None]) & (cols[None, :] < (left + w)[..., None])
    return (rmask[..., :, None] & cmask[..., None, :]).reshape(*top.shape, grid_h * grid_w)


def _sample_size(key, grid_h, grid_w, scale):
    """One (h, w) per call, shared across batch (reference dino.py:211-225)."""
    u = jax.random.uniform(key)
    area = scale[0] + u * (scale[1] - scale[0])
    max_keep = (grid_h * grid_w * area).astype(jnp.float32)
    side = jnp.round(jnp.sqrt(max_keep)).astype(jnp.int32)
    h = jnp.clip(side, 1, grid_h)
    w = jnp.clip(side, 1, grid_w)
    return h, w


def sample_block_masks(key, batch: int, grid_hw: tuple[int, int], scale: tuple[float, float], n_masks: int):
    """(n_masks, batch, grid_h*grid_w) bool keep-masks."""
    gh, gw = grid_hw
    k_size, k_top, k_left = jax.random.split(key, 3)
    h, w = _sample_size(k_size, gh, gw, scale)
    # corner ~ U{0, ..., grid-size}; size is traced, so sample uniform floats
    # and scale by the valid range (unbiased, static shapes)
    u_top = jax.random.uniform(k_top, (n_masks, batch))
    u_left = jax.random.uniform(k_left, (n_masks, batch))
    top = jnp.floor(u_top * (gh - h + 1)).astype(jnp.int32)
    left = jnp.floor(u_left * (gw - w + 1)).astype(jnp.int32)
    return _block_mask(top, left, h, w, gh, gw)


def sample_block_masks_constrained(
    key,
    batch: int,
    grid_hw: tuple[int, int],
    scale: tuple[float, float],
    n_masks: int,
    forbidden: jnp.ndarray,  # (B, N) bool: True where masks may NOT keep
    min_keep: int,
):
    """Global masks constrained away from ``forbidden`` (the union of local
    masks), falling back to the unconstrained block when the intersection
    drops below ``min_keep`` (reference dino.py:227-309 semantics)."""
    raw = sample_block_masks(key, batch, grid_hw, scale, n_masks)
    constrained = raw & ~forbidden[None]
    ok = constrained.sum(-1) > min_keep  # (M, B)
    return jnp.where(ok[..., None], constrained, raw)


def random_tube_masks(key, batch: int, grid_thw: tuple[int, int, int], ratio: float, n_masks: int):
    """V-JEPA-style tube masks: a 2-D spatial mask extruded through time
    (reference tactile_ssl/utils/masking.py:58-245 MaskCollator).

    Returns (n_masks, batch, T*H*W) bool KEEP masks with a static keep count
    round(H*W*(1-ratio)) per frame (argsort-of-uniform spatial selection)."""
    t, h, w = grid_thw
    n_spatial = h * w
    keep = max(int(round(n_spatial * (1.0 - ratio))), 1)
    noise = jax.random.uniform(key, (n_masks, batch, n_spatial))
    ranks = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)
    spatial_keep = ranks < keep  # (M, B, HW)
    return jnp.tile(spatial_keep, (1, 1, t))
