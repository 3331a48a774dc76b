"""Small utilities (reference tactile_ssl/utils/__init__.py parity).

* quaternion ops (:72-131): multiply, conjugate, rotate, to/from axis-angle;
* create_ndgrid (:39-69);
* AverageMeter (:194-217);
* patchify_image / patches_to_image live in ops/patches.py (NHWC).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quaternion_multiply(q1, q2):
    """Hamilton product, quaternions as (..., 4) wxyz."""
    w1, x1, y1, z1 = jnp.split(jnp.asarray(q1), 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(jnp.asarray(q2), 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quaternion_conjugate(q):
    q = jnp.asarray(q)
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def quaternion_apply(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    v = jnp.asarray(v)
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    out = quaternion_multiply(quaternion_multiply(q, qv), quaternion_conjugate(q))
    return out[..., 1:]


def axis_angle_to_quaternion(axis_angle):
    aa = jnp.asarray(axis_angle)
    # sqrt(sum + eps^2) keeps the gradient finite at aa == 0 (norm's VJP is
    # 0/0 there); forward shift is < 1e-8
    angle = jnp.sqrt(jnp.sum(aa * aa, axis=-1, keepdims=True) + 1e-16)
    half = angle * 0.5
    sin_half = jnp.where(angle > 1e-8, jnp.sin(half) / jnp.maximum(angle, 1e-8), 0.5)
    return jnp.concatenate([jnp.cos(half), aa * sin_half], axis=-1)


def quaternion_to_axis_angle(q):
    q = jnp.asarray(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.clip(1.0 - w**2, 1e-12, None))
    return q[..., 1:] / s * angle


def create_ndgrid(*sizes) -> np.ndarray:
    """(prod(sizes), len(sizes)) integer grid, row-major
    (reference utils/__init__.py:39-69)."""
    mesh = np.meshgrid(*[np.arange(s) for s in sizes], indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1)


class AverageMeter:
    """Running average (reference utils/__init__.py:194-217)."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {self.val:{self.fmt.strip(':')}} ({self.avg:{self.fmt.strip(':')}})"
