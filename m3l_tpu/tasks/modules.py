"""Per-task supervised probe modules (T1-T4, T6).

Loss/metric parity with the reference downstream modules:
* Force (force_sl.py:101-118): smooth-L1 beta=0.02; per-axis RMSE after
  rescaling by the dataset's force_scale.
* Slip (slip_sl.py:83-118): class-weighted CE; optional (delta-)force input.
* Pose (pose_sl.py:170-196): three class-weighted CE heads (x/y/theta bins)
  summed.
* Grasp (grasp_sl.py:93-115): class-weighted binary CE.
* Textile (textile_sl.py:104-125): class-weighted 20-way CE.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sl_module import SLModuleBase


def smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def weighted_ce(logits, labels, weights: Optional[jnp.ndarray] = None):
    """torch F.cross_entropy(weight=...) semantics: per-sample weighted NLL
    normalized by the sum of the applied weights."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if weights is None:
        return nll.mean()
    w = weights[labels]
    return (nll * w).sum() / jnp.clip(w.sum(), 1e-8, None)


class ForceSLModule(SLModuleBase):
    def training_loss(self, batch: dict, key, step):
        x, y_gt = batch["image"], batch["force"]
        y_pred = self.model_task(self.encode(x))
        loss = smooth_l1(y_pred, y_gt, beta=0.02).mean()
        scale = batch.get("force_scale", jnp.ones_like(y_gt))
        mse_xyz = jnp.mean((jax.lax.stop_gradient(y_pred) * scale - y_gt * scale) ** 2, axis=0)
        aux = {"loss": loss, "rmse_x": jnp.sqrt(mse_xyz[0]), "rmse_y": jnp.sqrt(mse_xyz[1]), "rmse_z": jnp.sqrt(mse_xyz[2])}
        return loss, aux

    def predict(self, x):
        return self.model_task(self.encode(x))


class SlipSLModule(SLModuleBase):
    def __init__(self, *args, class_weights=None, use_force: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.class_weights = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)
        self.use_force = use_force

    def training_loss(self, batch: dict, key, step):
        tokens = self.encode(batch["image"])
        if self.use_force:
            logits = self.model_task(tokens, batch["force"])
        else:
            logits = self.model_task(tokens)
        labels = batch["slip"].astype(jnp.int32)
        loss = weighted_ce(logits, labels, self.class_weights)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "accuracy": acc}

    def predict(self, x, force=None):
        tokens = self.encode(x)
        return self.model_task(tokens, force) if self.use_force else self.model_task(tokens)


class PoseSLModule(SLModuleBase):
    def __init__(self, *args, class_weights: Optional[dict] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.class_weights = {
            k: jnp.asarray(v, jnp.float32) for k, v in (class_weights or {}).items()
        }

    def training_loss(self, batch: dict, key, step):
        preds = self.model_task(self.encode(batch["image"]))
        losses, accs = {}, {}
        for head in ("x", "y", "theta"):
            labels = batch[f"pose_{head}"].astype(jnp.int32)
            losses[head] = weighted_ce(preds[head], labels, self.class_weights.get(head))
            accs[head] = jnp.mean((jnp.argmax(preds[head], -1) == labels).astype(jnp.float32))
        loss = sum(losses.values())
        aux = {"loss": loss}
        aux.update({f"loss_{k}": v for k, v in losses.items()})
        aux.update({f"acc_{k}": v for k, v in accs.items()})
        return loss, aux

    def predict(self, x):
        return self.model_task(self.encode(x))


class GraspSLModule(SLModuleBase):
    def __init__(self, *args, class_weights=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.class_weights = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def training_loss(self, batch: dict, key, step):
        logits = self.model_task(self.encode(batch["image"]))
        labels = batch["grasp"].astype(jnp.int32)
        loss = weighted_ce(logits, labels, self.class_weights)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "accuracy": acc}

    def predict(self, x):
        return self.model_task(self.encode(x))


class TextileSLModule(SLModuleBase):
    def __init__(self, *args, class_weights=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.class_weights = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def training_loss(self, batch: dict, key, step):
        logits = self.model_task(self.encode(batch["image"]))
        labels = batch["textile"].astype(jnp.int32)
        loss = weighted_ce(logits, labels, self.class_weights)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "accuracy": acc}

    def predict(self, x):
        return self.model_task(self.encode(x))
