"""Conv-net baseline encoders.

Capability parity with the reference's pretrained baselines (reference
tactile_ssl/model/pretrained.py:12-42 — torchvision resnet18/alexnet
wrappers used for probe comparisons). Zero-egress here means no pretrained
torchvision weights, so these are the same architectures trained from
scratch: a ResNet-18 and an AlexNet-style encoder, both emitting a token
sequence compatible with the probe heads ((B, N, D) from the final feature
map) plus a pooled feature vector.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


class _ConvBNRelu(nnx.Module):
    def __init__(self, cin, cout, k, s, p, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv = nnx.Conv(cin, cout, kernel_size=(k, k), strides=(s, s), padding=((p, p), (p, p)), use_bias=False, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.bn = nnx.BatchNorm(cout, use_running_average=True, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        return nnx.relu(self.bn(self.conv(x)))


class _BasicBlock(nnx.Module):
    def __init__(self, cin, cout, stride, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.c1 = _ConvBNRelu(cin, cout, 3, stride, 1, dtype=dtype, rngs=rngs)
        self.conv2 = nnx.Conv(cout, cout, kernel_size=(3, 3), padding="SAME", use_bias=False, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.bn2 = nnx.BatchNorm(cout, use_running_average=True, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.down = (
            _ConvBNRelu(cin, cout, 1, stride, 0, dtype=dtype, rngs=rngs) if (stride != 1 or cin != cout) else None
        )

    def __call__(self, x):
        h = self.bn2(self.conv2(self.c1(x)))
        skip = self.down(x) if self.down is not None else x
        return nnx.relu(h + skip)


class ResNet18Encoder(nnx.Module):
    def __init__(self, in_chans: int = 3, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.stem = _ConvBNRelu(in_chans, 64, 7, 2, 3, dtype=dtype, rngs=rngs)
        widths = [64, 64, 128, 128, 256, 256, 512, 512]
        strides = [1, 1, 2, 1, 2, 1, 2, 1]
        cins = [64] + widths[:-1]
        self.blocks = nnx.List([_BasicBlock(ci, co, s, dtype=dtype, rngs=rngs) for ci, co, s in zip(cins, widths, strides)])
        self.embed_dim = 512

    def forward_spatial(self, x):
        """Final conv feature map (B, H/32, W/32, 512) — the reference
        ResnetEncoder's last-scale feature consumed by the monodepth
        PoseDecoder (reference pose_estimator/resnet_encoder.py)."""
        import jax

        x = self.stem(x)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
        for blk in self.blocks:
            x = blk(x)
        return x

    def forward_features(self, x):
        x = self.forward_spatial(x)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        return {"x_norm_patchtokens": tokens, "x_norm_regtokens": tokens[:, :0], "x_prenorm": tokens, "masks": None}

    def __call__(self, x):
        return jnp.mean(self.forward_features(x)["x_norm_patchtokens"], axis=1)


class AlexNetEncoder(nnx.Module):
    def __init__(self, in_chans: int = 3, *, dtype=jnp.float32, rngs: nnx.Rngs):
        mk = lambda ci, co, k, s, p: nnx.Conv(ci, co, kernel_size=(k, k), strides=(s, s), padding=((p, p), (p, p)), dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.c1 = mk(in_chans, 64, 11, 4, 2)
        self.c2 = mk(64, 192, 5, 1, 2)
        self.c3 = mk(192, 384, 3, 1, 1)
        self.c4 = mk(384, 256, 3, 1, 1)
        self.c5 = mk(256, 256, 3, 1, 1)
        self.embed_dim = 256

    def forward_features(self, x):
        import jax

        pool = lambda v: jax.lax.reduce_window(v, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        x = pool(nnx.relu(self.c1(x)))
        x = pool(nnx.relu(self.c2(x)))
        x = nnx.relu(self.c3(x))
        x = nnx.relu(self.c4(x))
        x = pool(nnx.relu(self.c5(x)))
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        return {"x_norm_patchtokens": tokens, "x_norm_regtokens": tokens[:, :0], "x_prenorm": tokens, "masks": None}

    def __call__(self, x):
        return jnp.mean(self.forward_features(x)["x_norm_patchtokens"], axis=1)
