"""Force-field estimation: dense normal/shear maps from ViT features.

Capability parity with the reference force-field task (reference
tactile_ssl/downstream_task/forcefield_sl.py:33-412 +
utils_forcefield/): a DPT-style decoder — Reassemble blocks over ViT
intermediate layers [2, 5, 8, 11] (Reassemble.py), a top-down FeatureFusion
pyramid (Fusion.py), and a NormalShearHead (Head.py) emitting a 3-channel
field (1 normal + 2 shear) — trained either supervised or self-supervised
with a monodepth-style photometric flow loss (ssl_flow_loss.py SSIM +
ssl_utils.py warping): the predicted shear field warps frame t to t+1.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from .sl_module import SLModuleBase


class Reassemble(nnx.Module):
    """Tokens -> spatial map at a target scale (reference Reassemble.py)."""

    def __init__(self, embed_dim: int, out_ch: int, grid: tuple[int, int], scale: float, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.grid = grid
        self.scale = scale
        self.proj = nnx.Linear(embed_dim, out_ch, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.conv = nnx.Conv(out_ch, out_ch, kernel_size=(3, 3), padding="SAME", dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = tokens.shape
        gh, gw = self.grid
        x = self.proj(tokens).reshape(b, gh, gw, -1)
        th, tw = int(gh * self.scale), int(gw * self.scale)
        if (th, tw) != (gh, gw):
            x = jax.image.resize(x, (b, th, tw, x.shape[-1]), method="bilinear")
        return self.conv(x)


class ResidualConvUnit(nnx.Module):
    def __init__(self, ch: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(ch, ch, kernel_size=(3, 3), padding="SAME", dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.conv2 = nnx.Conv(ch, ch, kernel_size=(3, 3), padding="SAME", dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        h = self.conv1(nnx.relu(x))
        h = self.conv2(nnx.relu(h))
        return x + h


class FeatureFusionBlock(nnx.Module):
    """Top-down fusion with residual units + 2x upsample (reference Fusion.py)."""

    def __init__(self, ch: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.rcu1 = ResidualConvUnit(ch, dtype=dtype, rngs=rngs)
        self.rcu2 = ResidualConvUnit(ch, dtype=dtype, rngs=rngs)
        self.out_conv = nnx.Conv(ch, ch, kernel_size=(1, 1), dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x, skip=None):
        if skip is not None:
            if skip.shape[1:3] != x.shape[1:3]:
                skip = jax.image.resize(skip, x.shape, method="bilinear")
            x = x + self.rcu1(skip)
        x = self.rcu2(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
        return self.out_conv(x)


class NormalShearHead(nnx.Module):
    """convs -> (normal 1ch in [0,1], shear 2ch in [-1,1]) (reference Head.py)."""

    def __init__(self, ch: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(ch, ch // 2, kernel_size=(3, 3), padding="SAME", dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.conv2 = nnx.Conv(ch // 2, 32, kernel_size=(3, 3), padding="SAME", dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.out = nnx.Conv(32, 3, kernel_size=(1, 1), dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        h = nnx.relu(self.conv1(x))
        h = nnx.relu(self.conv2(h))
        y = self.out(h).astype(jnp.float32)
        normal = jax.nn.sigmoid(y[..., :1])
        shear = jnp.tanh(y[..., 1:])
        return jnp.concatenate([normal, shear], axis=-1)


class ForceFieldDecoder(nnx.Module):
    def __init__(self, encoder, *, hooks: Sequence[int] = (2, 5, 8, 11), fusion_ch: int = 128, dtype=jnp.float32, rngs: nnx.Rngs):
        self.encoder = encoder
        self.hooks = list(hooks)
        grid = tuple(encoder.patch_embed.grid)
        scales = (4.0, 2.0, 1.0, 0.5)  # DPT reassemble scales
        self.reassembles = nnx.List(
            [Reassemble(encoder.embed_dim, fusion_ch, grid, s, dtype=dtype, rngs=rngs) for s in scales]
        )
        self.fusions = nnx.List([FeatureFusionBlock(fusion_ch, dtype=dtype, rngs=rngs) for _ in scales])
        self.head = NormalShearHead(fusion_ch, dtype=dtype, rngs=rngs)
        self.img_size = tuple(encoder.img_size)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        layers = self.encoder.get_intermediate_layers(x, n=self.hooks, norm=True)
        maps = [re(tok) for re, tok in zip(self.reassembles, layers)]
        # top-down: start from the deepest (coarsest) map
        out = self.fusions[-1](maps[-1])
        for fuse, skip in zip(list(self.fusions[:-1])[::-1], maps[-2::-1]):
            out = fuse(out, skip)
        field = self.head(out)
        b = x.shape[0]
        return jax.image.resize(field, (b, *self.img_size, 3), method="bilinear")


# ---------------------------------------------------------------------- #
# self-supervised photometric (flow) loss (reference ssl_flow_loss.py)
# ---------------------------------------------------------------------- #
def warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-warp (B, H, W, C) by a pixel-displacement field (B, H, W, 2)."""
    b, h, w, c = img.shape
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    y = ys[None] + flow[..., 1]
    x = xs[None] + flow[..., 0]
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0, y - y0

    def gather(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        flat = img.reshape(b, h * w, c)
        idx = yy * w + xx
        return jnp.take_along_axis(flat, idx.reshape(b, -1)[..., None], axis=1).reshape(b, h, w, c)

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out


def ssim(a: jnp.ndarray, b: jnp.ndarray, c1: float = 0.01**2, c2: float = 0.03**2) -> jnp.ndarray:
    """Mean-pooled SSIM distance map (reference ssl_flow_loss.py SSIM)."""

    def pool(x):
        return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME") / 9.0

    mu_a, mu_b = pool(a), pool(b)
    var_a = pool(a * a) - mu_a**2
    var_b = pool(b * b) - mu_b**2
    cov = pool(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / ((mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    return jnp.clip((1.0 - s) / 2.0, 0.0, 1.0)


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.85) -> jnp.ndarray:
    return jnp.mean(alpha * ssim(pred, target) + (1.0 - alpha) * jnp.abs(pred - target))


class ForceFieldModule(SLModuleBase):
    """Supervised (normal/shear labels) or self-supervised (photometric flow)
    force-field training (reference forcefield_sl.py:95-412).

    The decoder owns the encoder (it consumes intermediate-layer hooks), so
    the frozen-encoder case excludes the ``encoder`` subtree of the task from
    the trainable filter rather than using SLModuleBase's wrapper."""

    def __init__(self, model_task: ForceFieldDecoder, *, shear_scale_px: float = 5.0, train_encoder: bool = False, checkpoint_encoder=None, encoder_type: str = "mae", base_lr: float = 1e-4, weight_decay: float = 0.04, warmup_epochs: int = 1):
        self.model_task = model_task
        self.shear_scale_px = shear_scale_px
        self.train_encoder = train_encoder
        self.base_lr = base_lr
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        if checkpoint_encoder is not None:
            from .sl_module import load_encoder_from_checkpoint

            load_encoder_from_checkpoint(model_task.encoder, checkpoint_encoder, encoder_type)
        if train_encoder:
            self.trainable_filter = nnx.Param

    trainable_filter = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("encoder")))

    def training_loss(self, batch: dict, key, step):
        x = batch["image"]  # (B, H, W, C) with 2 stacked frames when SSL
        field = self.model_task(x)
        if "forcefield" in batch:  # supervised
            loss = jnp.mean((field - batch["forcefield"]) ** 2)
            return loss, {"loss": loss}
        # SSL: shear field as optical flow warping frame t -> frame t+1
        c = x.shape[-1] // 2
        frame_t, frame_t1 = x[..., :c], x[..., c:]
        flow = field[..., 1:] * self.shear_scale_px
        warped = warp(frame_t.astype(jnp.float32), flow)
        loss = photometric_loss(warped, frame_t1.astype(jnp.float32))
        # mild smoothness prior on the field
        smooth = jnp.mean(jnp.abs(jnp.diff(field, axis=1))) + jnp.mean(jnp.abs(jnp.diff(field, axis=2)))
        total = loss + 0.1 * smooth
        return total, {"loss": total, "photo_loss": loss, "smooth_loss": smooth}

    def encode(self, x):  # decoder consumes raw images via encoder hooks
        return x

    def predict(self, x):
        return self.model_task(x)
