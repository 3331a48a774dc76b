"""Early-convolution tokenizer (NHWC).

Produces one token per output spatial location, replicating the reference's
``EarlyCNN`` tower (reference: models/pretrain_models.py:37-56): three strided
4x4 convs (the third is 3x3/stride-1 for the tactile tower so a 32x32 tactile
map and a 64x64 image both yield an 8x8 = 64-token grid) followed by a 1x1
projection to the encoder width. ReLU after convs 1-3, none after the 1x1.

Token order is row-major over the output grid, identical to the reference's
``flatten(2).transpose(1, 2)`` on NCHW.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


class EarlyCNN(nnx.Module):
    def __init__(self, in_channels: int, encoder_dim: int, *, kind: str = "image", dtype=jnp.float32, rngs: nnx.Rngs):
        common = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.conv1 = nnx.Conv(in_channels, encoder_dim // 8, kernel_size=(4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), **common)
        self.conv2 = nnx.Conv(encoder_dim // 8, encoder_dim // 4, kernel_size=(4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), **common)
        if kind == "image":
            self.conv3 = nnx.Conv(encoder_dim // 4, encoder_dim // 2, kernel_size=(4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), **common)
        else:
            self.conv3 = nnx.Conv(encoder_dim // 4, encoder_dim // 2, kernel_size=(3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), **common)
        self.conv4 = nnx.Conv(encoder_dim // 2, encoder_dim, kernel_size=(1, 1), **common)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) -> (B, tokens, encoder_dim)."""
        x = nnx.relu(self.conv1(x))
        x = nnx.relu(self.conv2(x))
        x = nnx.relu(self.conv3(x))
        x = self.conv4(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)
