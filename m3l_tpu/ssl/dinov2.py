"""DINOv2 = DINO CLS distillation + iBOT patch distillation + KoLeo.

Capability parity with the reference DINOv2Module
(reference tactile_ssl/algorithm/dinov2.py:75-513): student/teacher
backbone + DINO head (+ optional separate iBOT head, :75-97), two global
masks whose teacher views are swapped so crop A distills to crop B
(:396-399), centering or Sinkhorn-Knopp teacher normalization (:409-447),
loss assembly dino/(pair-terms) + ibot/num_global + koleo_weight * koleo
per global view (:449-468).

TPU notes: the xformers BlockDiagonalMask head batching (:376-380) is
unnecessary at static shapes — global and local CLS tokens go through the
head as one padded batch; patch-token losses and center updates are weighted
by the boolean keep-masks (equal block areas per call make the weighted
center exactly the reference's gathered-token center).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.vit_layers import DINOHead
from ..models.vit import VisionTransformer
from .dino import CenterState, DINOModule, _layer_norm
from .module import as_float_image
from .losses import (
    DINOLossState,
    dino_cross_entropy,
    ibot_patch_loss_all_pairs,
    koleo_loss,
    sinkhorn_knopp_teacher,
    softmax_center_teacher,
    update_center,
)


class DINOv2Module(DINOModule):
    def __init__(
        self,
        encoder: VisionTransformer,
        *,
        ibot_separate_head: bool = False,
        ibot_out_dim: Optional[int] = None,
        koleo_weight: float = 0.1,
        centering: str = "centering",  # or "sinkhorn_knopp"
        num_global_masks: int = 2,
        dino_out_dim: int = 65536,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
        **kwargs,
    ):
        super().__init__(
            encoder,
            num_global_masks=num_global_masks,
            dino_out_dim=dino_out_dim,
            dtype=dtype,
            rngs=rngs,
            **kwargs,
        )
        self.koleo_weight = koleo_weight
        self.centering = centering
        self.ibot_separate_head = ibot_separate_head
        ibot_dim = ibot_out_dim or dino_out_dim
        if ibot_separate_head:
            self.student_ibot_head = DINOHead(encoder.embed_dim, ibot_dim, dtype=dtype, rngs=rngs)
            self.teacher_ibot_head = nnx.clone(self.student_ibot_head)
        self.ibot_center = CenterState(jnp.zeros((1, 1, ibot_dim), jnp.float32))

    trainable_filter = nnx.All(
        nnx.Param,
        nnx.Not(nnx.PathContains("teacher_backbone")),
        nnx.Not(nnx.PathContains("teacher_head")),
        nnx.Not(nnx.PathContains("teacher_ibot_head")),
    )

    def _ibot_heads(self):
        if self.ibot_separate_head:
            return self.student_ibot_head, self.teacher_ibot_head
        return self.student_head, self.teacher_head

    def forward_loss(self, x, global_masks, local_masks, teacher_temp):
        b = x.shape[0]
        mg, ml = self.num_global_masks, self.num_local_masks
        s_ibot_head, t_ibot_head = self._ibot_heads()

        student_global = self.student_backbone.forward_features_multimask(x, global_masks)
        student_local = self.student_backbone.forward_features_multimask(x, local_masks)
        s_cls_g = self.student_head(student_global["x_norm_regtokens"][:, 0])  # (Mg*B, K)
        s_cls_l = self.student_head(student_local["x_norm_regtokens"][:, 0])  # (Ml*B, K)
        student_views = list(s_cls_g.reshape(mg, b, -1)) + list(s_cls_l.reshape(ml, b, -1))
        s_patch = s_ibot_head(student_global["x_norm_patchtokens"])  # (Mg*B, N, Ki)

        teacher_global = self.teacher_backbone.forward_features_multimask(x, global_masks)
        t_cls = jax.lax.stop_gradient(self.teacher_head(teacher_global["x_norm_regtokens"][:, 0]))  # (Mg*B, K)
        t_patch = jax.lax.stop_gradient(t_ibot_head(teacher_global["x_norm_patchtokens"]))  # (Mg*B, N, Ki)

        keep = global_masks.reshape(mg * b, -1)  # (Mg*B, N) bool

        if self.centering == "centering":
            t_probs_cls = softmax_center_teacher(DINOLossState(self.center[...]), t_cls, teacher_temp)
            t_probs_patch = softmax_center_teacher(DINOLossState(self.ibot_center[...].reshape(1, -1)), t_patch, teacher_temp)
        elif self.centering == "sinkhorn_knopp":
            t_probs_cls = sinkhorn_knopp_teacher(t_cls, teacher_temp)
            flat = t_patch.reshape(-1, t_patch.shape[-1])
            n_masked = keep.sum()
            # non-kept rows are excluded from the transport problem, matching
            # the reference's Sinkhorn over gathered kept tokens only
            t_probs_patch = sinkhorn_knopp_teacher(
                flat, teacher_temp, n_samples=n_masked, sample_mask=keep.reshape(-1)
            ).reshape(t_patch.shape)
        else:
            raise NotImplementedError(self.centering)

        # swap the teacher global views so crop A distills crop B (:396-399)
        t_views = list(t_probs_cls.reshape(mg, b, -1))
        t_views = t_views[1:] + t_views[:1]

        n_local_terms = max(ml * mg, 1)
        n_global_terms = (mg - 1) * mg
        dino_loss = dino_cross_entropy(student_views, t_views, self.student_temp) / (n_local_terms + n_global_terms)

        # all (student view, teacher view) pairs with plain masked means,
        # scaled by 1/Mg (reference dinov2.py:465-468 ibot_loss_scale *
        # iBOTPatchLoss.forward over the view lists)
        n = s_patch.shape[1]
        ibot = (
            ibot_patch_loss_all_pairs(
                s_patch.reshape(mg, b, n, -1),
                t_probs_patch.reshape(mg, b, n, -1),
                keep.reshape(mg, b, n),
                self.student_temp,
            )
            / mg
        )

        # KoLeo regularizes the PRE-head backbone CLS embeddings per global
        # view (reference dinov2.py:458-462 applies koleo_loss to
        # student_global_cls_tokens, not the head outputs)
        s_cls_prehead = student_global["x_norm_regtokens"][:, 0].reshape(mg, b, -1)
        koleo = self.koleo_weight * sum(koleo_loss(s_cls_prehead[i]) for i in range(mg))

        aux = {
            "dino_loss": dino_loss,
            "ibot_loss": ibot,
            "koleo_loss": koleo,
            "teacher_logits": t_cls,
            "teacher_patch_logits": t_patch,
            "patch_keep": keep,
        }
        return dino_loss + ibot + koleo, aux

    def training_loss(self, batch: dict, key: jax.Array, step):
        x = as_float_image(batch["image"])
        k_mask, _ = jax.random.split(key)
        global_masks, local_masks = self.sample_masks(k_mask, x.shape[0])
        temp = self._temp_fn(step)
        loss, aux = self.forward_loss(x, global_masks, local_masks, temp)
        aux["teacher_temp"] = temp
        if self.recon_probe is not None:
            t_out = self.teacher_backbone.forward_features(x)
            emb = _layer_norm(jax.lax.stop_gradient(t_out["x_norm_patchtokens"]))
            pred = self.recon_probe(emb)
            from ..ops.patches import patchify

            target = patchify(x, self.patch_size, self.patch_size).astype(jnp.float32)
            probe_loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
            aux["reconstruction_loss"] = probe_loss
            loss = loss + probe_loss
        aux["loss"] = loss
        return loss, aux

    def on_train_batch_end(self, aux: dict, step) -> None:
        if self.centering == "centering":
            new = update_center(DINOLossState(self.center[...]), aux["teacher_logits"], momentum=0.9)
            self.center[...] = new.center
            # masked patch-center: per-sample masked token mean, then batch mean
            # (= reference ibot_patch_loss.py:147-151 on gathered tokens)
            t = aux["teacher_patch_logits"].astype(jnp.float32)
            w = aux["patch_keep"].astype(jnp.float32)[..., None]
            per_sample = (t * w).sum(1) / jnp.clip(w.sum(1), 1.0, None)
            batch_center = per_sample.mean(0).reshape(self.ibot_center[...].shape)
            self.ibot_center[...] = self.ibot_center[...] * 0.9 + batch_center * 0.1
        if self.use_momentum:
            decay = self._momentum_fn(step)
            from .ema import ema_update

            pairs = [(self.teacher_backbone, self.student_backbone), (self.teacher_head, self.student_head)]
            if self.ibot_separate_head:
                pairs.append((self.teacher_ibot_head, self.student_ibot_head))
            for t_mod, s_mod in pairs:
                nnx.update(t_mod, ema_update(nnx.state(t_mod, nnx.Param), nnx.state(s_mod, nnx.Param), decay))
