"""Multimodal VTT for DINO-style training.

Capability parity with the reference's extended VTT (reference
models/VTT.py:77-427): three patch-embedding towers (image + one per tactile
sensor, equal patch counts per modality), ONE sinusoidal positional table
laid out over a vertically-stacked (3H, W) grid with each modality taking its
contiguous third (:195-199,289-295), register tokens, a vit-pytorch-style
transformer trunk with a final eps-1e-6 norm, and the DINO
``forward_features`` dict contract (:337-360).

Masking: the reference applies the SAME per-modality-position index masks to
all three modality embeddings (apply_masks per tower, :299-303). Here masks
are boolean (B, N_mod) keep-masks tiled across the three modality segments
and enforced by attention key-masking (static shapes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.transformer import Transformer
from ..ops.posenc import sincos_nd
from .vtt import PatchEmbed


class MultimodalVTT(nnx.Module):
    def __init__(
        self,
        *,
        image_size=(70, 70),
        tactile_size=(70, 70),
        image_patch_size: int = 14,
        tactile_patch_size: int = 14,
        dim: int = 384,
        depth: int = 4,
        heads: int = 6,
        mlp_dim: int = 768,
        dim_head: int = 64,
        image_channels: int = 3,
        tactile_channels: int = 3,
        num_tactiles: int = 2,
        frame_stack: int = 1,
        num_register_tokens: int = 1,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        ih, iw = (image_size, image_size) if isinstance(image_size, int) else image_size
        th, tw = (tactile_size, tactile_size) if isinstance(tactile_size, int) else tactile_size
        self.embed_dim = dim
        self.num_register_tokens = num_register_tokens
        self.num_tactiles = num_tactiles
        self.frame_stack = frame_stack
        self.dtype = dtype
        self.image_grid = (ih // image_patch_size, iw // image_patch_size)
        self.tactile_grid = (th // tactile_patch_size, tw // tactile_patch_size)
        n_img = self.image_grid[0] * self.image_grid[1]
        n_tac = self.tactile_grid[0] * self.tactile_grid[1]
        assert n_img == n_tac, "reference VTT.py requires equal patch counts per modality (:339-341)"
        self.patches_per_modality = n_img
        self.num_modalities = 1 + num_tactiles
        self.num_patches = self.patches_per_modality * self.num_modalities
        # mask sampling happens on the per-modality grid
        self.mask_grid = self.image_grid

        ich = image_channels * frame_stack
        tch = tactile_channels * frame_stack
        self.image_embed = PatchEmbed(image_patch_size, image_patch_size, ich * image_patch_size**2, dim, dtype=dtype, rngs=rngs)
        self.tactile_embeds = nnx.List(
            [PatchEmbed(tactile_patch_size, tactile_patch_size, tch * tactile_patch_size**2, dim, dtype=dtype, rngs=rngs) for _ in range(num_tactiles)]
        )
        # stacked-layout sinusoidal table over ((1+num_tactiles)*gh, gw)
        gh, gw = self.image_grid
        self._pos_table = nnx.data(sincos_nd((self.num_modalities * gh, gw), dim))
        self.register_tokens = (
            nnx.Param(jax.random.normal(rngs.params(), (1, num_register_tokens, dim), jnp.float32) * 1e-6)
            if num_register_tokens
            else None
        )
        self.transformer = Transformer(dim, depth, heads, dim_head, mlp_dim, dtype=dtype, rngs=rngs)
        self.norm = nnx.LayerNorm(dim, epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    # ------------------------------------------------------------------ #
    def _embed_all(self, x: dict) -> jnp.ndarray:
        n = self.patches_per_modality
        pos = self._pos_table
        parts = [self.image_embed(self.image_embed.to_patches(x["image"]).astype(self.dtype)) + pos[None, :n].astype(self.dtype)]
        for i, tower in enumerate(self.tactile_embeds):
            t = tower(tower.to_patches(x[f"tactile{i + 1}"]).astype(self.dtype))
            parts.append(t + pos[None, (i + 1) * n : (i + 2) * n].astype(self.dtype))
        return jnp.concatenate(parts, axis=1)  # (B, 3N, D)

    def _with_registers(self, tokens: jnp.ndarray, km: Optional[jnp.ndarray]):
        if self.register_tokens is not None:
            b = tokens.shape[0]
            regs = jnp.broadcast_to(self.register_tokens[...], (b, self.num_register_tokens, self.embed_dim)).astype(tokens.dtype)
            tokens = jnp.concatenate([regs, tokens], axis=1)
            if km is not None:
                km = jnp.concatenate([jnp.ones((b, self.num_register_tokens), bool), km], axis=1)
        return tokens, km

    def forward_features(self, x: dict, key_mask: Optional[jnp.ndarray] = None) -> dict:
        """key_mask: (B, patches_per_modality) bool — same positions masked in
        every modality (reference :299-303)."""
        tokens = self._embed_all(x)
        km = jnp.tile(key_mask, (1, self.num_modalities)) if key_mask is not None else None
        tokens, km = self._with_registers(tokens, km)
        out = self.transformer(tokens, km)
        x_norm = self.norm(out)
        r = self.num_register_tokens
        return {
            "x_norm_regtokens": x_norm[:, :r],
            "x_norm_patchtokens": x_norm[:, r:],
            "x_prenorm": out,
            "masks": key_mask,
        }

    def forward_features_multimask(self, x: dict, key_masks: jnp.ndarray, dp_key=None) -> dict:
        """key_masks: (M, B, patches_per_modality) bool; one batched pass with
        tokens tiled mask-major, matching the reference's apply_masks concat
        order."""
        m, b, n = key_masks.shape
        tokens = self._embed_all(x)
        tokens = jnp.tile(tokens, (m, 1, 1))
        km = jnp.tile(key_masks.reshape(m * b, n), (1, self.num_modalities))
        tokens, km = self._with_registers(tokens, km)
        out = self.transformer(tokens, km)
        x_norm = self.norm(out)
        r = self.num_register_tokens
        return {
            "x_norm_regtokens": x_norm[:, :r],
            "x_norm_patchtokens": x_norm[:, r:],
            "x_prenorm": out,
            "masks": key_masks,
        }

