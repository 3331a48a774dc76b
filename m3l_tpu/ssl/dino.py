"""DINO self-distillation with block masks.

Capability parity with the reference DINOModule
(reference tactile_ssl/algorithm/dino.py:29-529): student/teacher
backbone+DINOHead pairs, one global + several local block masks per step,
register-token outputs used as CLS (:343-346), teacher softmax-centering
with EMA center, CE distillation over all (student view, teacher view)
pairs, EMA teacher update with a linear momentum ramp (:481-488), linear
teacher-temperature warmup (:518-529), and an optional online reconstruction
probe on layer-normed teacher patch tokens (:406-430).

TPU redesign: mask sampling is vectorized/static-shape (ssl/masks.py) and the
student's multi-mask forward is one batched pass with attention key-masking
(models/vit.py forward_features_multimask) instead of per-sample host loops
+ ragged gathers.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.vit_layers import DINOHead
from ..models.vit import VisionTransformer
from ..ops.patches import patchify
from .decoders import DecoderViT
from .losses import DINOLossState, dino_cross_entropy, softmax_center_teacher, update_center
from .masks import sample_block_masks, sample_block_masks_constrained
from .module import as_float_image, SSLModule
from .ema import ema_update
from .schedulers import linear_schedule, teacher_temp_schedule


class CenterState(nnx.Variable):
    """Non-trainable loss state (teacher center)."""


class DINOModule(SSLModule):
    trainable_filter = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("teacher_backbone")), nnx.Not(nnx.PathContains("teacher_head")))

    def __init__(
        self,
        encoder: VisionTransformer,
        *,
        dino_out_dim: int = 65536,
        dino_hidden_dim: int = 2048,
        dino_bottleneck_dim: int = 256,
        local_mask_scale: Tuple[float, float] = (0.2, 0.8),
        global_mask_scale: Tuple[float, float] = (0.2, 0.8),
        num_global_masks: int = 1,
        num_local_masks: int = 4,
        min_keep_num_sensors: int = 4,
        allow_mask_overlap: bool = False,
        moving_average_decay: Union[float, Tuple[float, float]] = 0.99,
        teacher_temp: Union[float, Tuple[float, float]] = (0.04, 0.07),
        teacher_warmup_epochs: int = 10,
        student_temp: float = 0.1,
        use_momentum: bool = True,
        with_reconstruction_probe: bool = True,
        base_lr: float = 1e-4,
        weight_decay: float = 0.04,
        warmup_epochs: int = 10,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert encoder.num_register_tokens >= 1, "DINO requires >=1 register token (reference dino.py:343-345)"
        self.student_backbone = encoder
        self.student_head = DINOHead(encoder.embed_dim, dino_out_dim, hidden_dim=dino_hidden_dim, bottleneck_dim=dino_bottleneck_dim, dtype=dtype, rngs=rngs)
        self.teacher_backbone = nnx.clone(encoder)
        self.teacher_head = nnx.clone(self.student_head)
        self.center = CenterState(jnp.zeros((1, dino_out_dim), jnp.float32))

        self.patch_size = encoder.patch_size
        self.grid = tuple(encoder.patch_embed.grid)
        self.local_mask_scale = local_mask_scale
        self.global_mask_scale = global_mask_scale
        self.num_global_masks = num_global_masks
        self.num_local_masks = num_local_masks
        self.min_keep = min_keep_num_sensors
        self.allow_mask_overlap = allow_mask_overlap
        self.student_temp = student_temp
        self.use_momentum = use_momentum
        self.moving_average_decay = moving_average_decay
        self.teacher_temp = teacher_temp
        self.teacher_warmup_epochs = teacher_warmup_epochs
        self.base_lr = base_lr
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs

        self.recon_probe = (
            DecoderViT(
                input_embed_dim=encoder.embed_dim,
                img_size=encoder.img_size,
                patch_size=encoder.patch_size,
                in_chans=encoder.in_chans,
                embed_dim=256,
                depth=2,
                num_heads=8,
                dtype=dtype,
                rngs=rngs,
            )
            if with_reconstruction_probe
            else None
        )
        # schedule closures filled by setup_schedules (trainer calls it)
        self._momentum_fn = lambda step: jnp.asarray(
            moving_average_decay if isinstance(moving_average_decay, float) else moving_average_decay[0], jnp.float32
        )
        self._temp_fn = teacher_temp_schedule(teacher_temp if isinstance(teacher_temp, (int, float)) else tuple(teacher_temp), 1)

    def setup_schedules(self, steps_per_epoch: int, epochs: int) -> None:
        total = steps_per_epoch * epochs
        if not isinstance(self.moving_average_decay, (int, float)):
            m0, m1 = self.moving_average_decay
            self._momentum_fn = linear_schedule(m0, m1, total)
        self._temp_fn = teacher_temp_schedule(
            self.teacher_temp if isinstance(self.teacher_temp, (int, float)) else tuple(self.teacher_temp),
            self.teacher_warmup_epochs * steps_per_epoch,
        )

    # ------------------------------------------------------------------ #
    def sample_masks(self, key: jax.Array, batch: int):
        """(global (Mg, B, N), local (Ml, B, N)) bool keep-masks
        (reference dino.py:267-327 semantics, vectorized)."""
        k_local, k_global = jax.random.split(key)
        local = sample_block_masks(k_local, batch, self.grid, self.local_mask_scale, self.num_local_masks)
        if self.allow_mask_overlap:
            glob = sample_block_masks(k_global, batch, self.grid, self.global_mask_scale, self.num_global_masks)
        else:
            forbidden = jnp.any(local, axis=0)  # union of local keeps
            glob = sample_block_masks_constrained(
                k_global, batch, self.grid, self.global_mask_scale, self.num_global_masks, forbidden, self.min_keep
            )
        return glob, local

    def _cls_after_head(self, backbone, head, x, masks, dp_key=None):
        out = backbone.forward_features_multimask(x, masks, dp_key)
        cls = out["x_norm_regtokens"][:, :1]  # first register token as CLS
        return head(cls[:, 0]), out

    def forward_loss(self, x, global_masks, local_masks, teacher_temp):
        b = (x["image"] if isinstance(x, dict) else x).shape[0]
        student_global, _ = self._cls_after_head(self.student_backbone, self.student_head, x, global_masks)
        student_local, _ = self._cls_after_head(self.student_backbone, self.student_head, x, local_masks)
        # (M*B, K) -> list of per-view (B, K), mask-major order
        student_views = list(student_global.reshape(self.num_global_masks, b, -1)) + list(
            student_local.reshape(self.num_local_masks, b, -1)
        )
        teacher_logits, _ = self._cls_after_head(self.teacher_backbone, self.teacher_head, x, global_masks)
        teacher_logits = jax.lax.stop_gradient(teacher_logits)
        teacher_probs = softmax_center_teacher(DINOLossState(self.center[...]), teacher_logits, teacher_temp)
        teacher_views = list(teacher_probs.reshape(self.num_global_masks, b, -1))
        loss = dino_cross_entropy(student_views, teacher_views, self.student_temp)
        return loss, teacher_logits

    def training_loss(self, batch: dict, key: jax.Array, step):
        x = as_float_image(batch["image"])
        k_mask, k_dp = jax.random.split(key)
        global_masks, local_masks = self.sample_masks(k_mask, x.shape[0])
        temp = self._temp_fn(step)
        ssl_loss, teacher_logits = self.forward_loss(x, global_masks, local_masks, temp)
        aux = {"ssl_loss": ssl_loss, "teacher_logits": teacher_logits, "teacher_temp": temp}
        loss = ssl_loss
        if self.recon_probe is not None:
            t_out = self.teacher_backbone.forward_features(x)
            emb = jax.lax.stop_gradient(t_out["x_norm_patchtokens"])
            emb = _layer_norm(emb)
            pred = self.recon_probe(emb)
            target = patchify(x, self.patch_size, self.patch_size).astype(jnp.float32)
            probe_loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
            aux["reconstruction_loss"] = probe_loss
            aux["pred_patches"] = pred
            loss = loss + probe_loss
        aux["loss"] = loss
        return loss, aux

    def on_train_batch_end(self, aux: dict, step) -> None:
        # teacher center EMA (dino_loss.py:77-102)
        new_state = update_center(DINOLossState(self.center[...]), aux["teacher_logits"], momentum=0.9)
        self.center[...] = new_state.center
        if self.use_momentum:
            decay = self._momentum_fn(step)
            for t_mod, s_mod in ((self.teacher_backbone, self.student_backbone), (self.teacher_head, self.student_head)):
                t_state = nnx.state(t_mod, nnx.Param)
                s_state = nnx.state(s_mod, nnx.Param)
                nnx.update(t_mod, ema_update(t_state, s_state, decay))


def _layer_norm(x):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)
