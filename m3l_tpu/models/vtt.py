"""VTT — Vision-Tactile Transformer encoder.

Multimodal ViT over image patches plus N tactile-sensor patch grids.
Capability parity with the reference's VTT (reference:
models/pretrain_models.py:717-786): dual patch-embedding towers
(patchify -> LayerNorm -> Linear -> LayerNorm), a learned positional table
with a legacy CLS row, and a pre-norm transformer trunk.

TPU-first design: NHWC tensors, patchify is a reshape/transpose that XLA
fuses into the first LayerNorm/matmul; the trunk runs in a configurable
compute dtype (bfloat16 on TPU) with float32 parameters.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.transformer import Transformer
from ..ops.patches import patchify


@dataclasses.dataclass(frozen=True)
class VTTConfig:
    image_size: tuple[int, int] = (64, 64)
    tactile_size: tuple[int, int] = (32, 32)
    image_patch_size: int = 8
    tactile_patch_size: int = 4
    dim: int = 256
    depth: int = 4
    heads: int = 4
    mlp_dim: int = 512
    dim_head: int = 64
    image_channels: int = 3
    tactile_channels: int = 3
    num_tactiles: int = 2
    frame_stack: int = 1

    @property
    def image_grid(self) -> tuple[int, int]:
        return (
            self.image_size[0] // self.image_patch_size,
            self.image_size[1] // self.image_patch_size,
        )

    @property
    def tactile_grid(self) -> tuple[int, int]:
        return (
            self.tactile_size[0] // self.tactile_patch_size,
            self.tactile_size[1] // self.tactile_patch_size,
        )

    @property
    def num_image_patches(self) -> int:
        gh, gw = self.image_grid
        return gh * gw

    @property
    def num_tactile_patches_per_sensor(self) -> int:
        gh, gw = self.tactile_grid
        return gh * gw

    @property
    def num_tactile_patches(self) -> int:
        return self.num_tactile_patches_per_sensor * self.num_tactiles

    @property
    def num_patches(self) -> int:
        return self.num_image_patches + self.num_tactile_patches

    @property
    def image_patch_dim(self) -> int:
        return self.image_channels * self.image_patch_size**2

    @property
    def tactile_patch_dim(self) -> int:
        return self.tactile_channels * self.tactile_patch_size**2


class PatchEmbed(nnx.Module):
    """patchify -> LayerNorm(patch_dim) -> Linear(dim) -> LayerNorm(dim)."""

    def __init__(self, patch_h: int, patch_w: int, patch_dim: int, dim: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.patch_h, self.patch_w = patch_h, patch_w
        self.norm_in = nnx.LayerNorm(patch_dim, epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.proj = nnx.Linear(patch_dim, dim, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.norm_out = nnx.LayerNorm(dim, epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def to_patches(self, x: jnp.ndarray) -> jnp.ndarray:
        return patchify(x, self.patch_h, self.patch_w)

    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        return self.norm_out(self.proj(self.norm_in(patches)))


class VTT(nnx.Module):
    def __init__(self, config: VTTConfig, *, dtype=jnp.float32, rngs: nnx.Rngs):
        c = config
        self.config = c
        self.dtype = dtype
        ich = c.image_channels * c.frame_stack
        tch = c.tactile_channels * c.frame_stack
        self.image_embed = PatchEmbed(
            c.image_patch_size, c.image_patch_size, ich * c.image_patch_size**2, c.dim, dtype=dtype, rngs=rngs
        )
        self.tactile_embed = PatchEmbed(
            c.tactile_patch_size, c.tactile_patch_size, tch * c.tactile_patch_size**2, c.dim, dtype=dtype, rngs=rngs
        )
        # learned positional table with a legacy CLS slot at row 0; the
        # multimodal path indexes rows 1..N (reference pretrain_models.py:219)
        self.pos_embedding = nnx.Param(jax.random.normal(rngs.params(), (1, c.num_patches + 1, c.dim), jnp.float32))
        self.transformer = Transformer(c.dim, c.depth, c.heads, c.dim_head, c.mlp_dim, dtype=dtype, rngs=rngs)

    @property
    def stacked_image_channels(self) -> int:
        return self.config.image_channels * self.config.frame_stack

    @property
    def stacked_tactile_channels(self) -> int:
        return self.config.tactile_channels * self.config.frame_stack
