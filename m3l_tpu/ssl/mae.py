"""He-style MAE over single (concat-channel) tactile images.

Capability parity with the reference MAEModule
(reference tactile_ssl/algorithm/mae.py:60-259): argsort-of-uniform random
masking producing (ids_keep, binary mask, ids_restore) (:83-115), encoder on
visible tokens, MaskDecoderViT restore + per-patch prediction, masked MSE
with optional per-patch pixel normalization (:129-144), AdamW betas
(0.9, 0.95) with the WD split and warmup-cosine LR / cosine WD (:160-212).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.vit import VisionTransformer
from ..ops.patches import patchify
from .decoders import MaskDecoderViT, MaskedQueryDecoderViT
from .module import SSLModule, as_float_image


class MAEModule(SSLModule):
    def __init__(
        self,
        encoder: VisionTransformer,
        *,
        decoder_embed_dim: int = 512,
        decoder_depth: int = 8,
        decoder_num_heads: int = 16,
        mask_ratio: float = 0.75,
        norm_pix_loss: bool = True,
        decode_masked_only: bool = False,
        base_lr: float = 1e-4,
        weight_decay: float = 0.04,
        warmup_epochs: int = 10,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.encoder = encoder
        self.mask_ratio = mask_ratio
        self.norm_pix_loss = norm_pix_loss
        self.decode_masked_only = decode_masked_only
        self.base_lr = base_lr
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        self.betas = (0.9, 0.95)
        self.patch_size = encoder.patch_size
        self.num_patches = encoder.num_patches
        # decode_masked_only: CrossMAE-style masked-query decoder — valid
        # because the loss reads masked positions only (reference
        # mae.py:129-144); ~1.5x fewer decoder FLOPs at mask 0.75. The
        # default (False) is the reference's exact He-style architecture.
        decoder_cls = MaskedQueryDecoderViT if decode_masked_only else MaskDecoderViT
        self.decoder = decoder_cls(
            input_embed_dim=encoder.embed_dim,
            img_size=encoder.img_size,
            patch_size=encoder.patch_size,
            in_chans=encoder.in_chans,
            embed_dim=decoder_embed_dim,
            depth=decoder_depth,
            num_heads=decoder_num_heads,
            dtype=dtype,
            rngs=rngs,
        )

    def random_masking(self, key: jax.Array, batch: int):
        """(ids_keep, mask, ids_restore) exactly as reference mae.py:83-115."""
        n = self.num_patches
        len_keep = int(n * (1.0 - self.mask_ratio))
        noise = jax.random.uniform(key, (batch, n))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        mask = jnp.ones((batch, n))
        mask = mask.at[:, :len_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return ids_keep, mask, ids_restore

    def __call__(self, x: jnp.ndarray, key: jax.Array):
        """x: (B, H, W, C). Returns (pred_patches, mask)."""
        ids_keep, mask, ids_restore = self.random_masking(key, x.shape[0])
        out = self.encoder.forward_features(x, mask_indices=ids_keep)
        latent = jnp.concatenate([out["x_norm_regtokens"], out["x_norm_patchtokens"]], axis=1)
        # registers (if any) are dropped before decoding: decoder restores
        # only patch positions
        latent = latent[:, self.encoder.num_register_tokens :]
        if self.decode_masked_only:
            len_keep = ids_keep.shape[1]
            ids_masked = jnp.argsort(ids_restore, axis=1)[:, len_keep:]
            pred = self.decoder(latent, ids_keep, ids_masked)
        else:
            pred = self.decoder(latent, ids_restore)
        return pred, mask

    def compute_loss(self, imgs: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray):
        target = patchify(imgs, self.patch_size, self.patch_size).astype(jnp.float32)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / (var + 1.0e-6) ** 0.5
        loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2, axis=-1)  # (B, N)
        return (loss * mask).sum() / jnp.clip(mask.sum(), 1.0, None)

    def training_loss(self, batch: dict, key: jax.Array, step):
        x = as_float_image(batch["image"])
        pred, mask = self(x, key)
        loss = self.compute_loss(x, pred, mask)
        return loss, {"loss": loss}

    def reconstruction_images(self, batch: dict, key: jax.Array, max_images: int = 8) -> dict:
        """Masked/reconstructed image grids for the Trainer's image logging
        (reference mae.py:214-259 wandb reconstruction logging). Returns
        {original, masked, reconstruction} as (H, B*W, 3) strips — only the
        first 3 channels of multi-frame inputs are displayed."""
        from ..ops.patches import unpatchify

        x = as_float_image(batch["image"][:max_images])
        p = self.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        pred, mask = self(x, key)
        target = patchify(x, p, p).astype(jnp.float32)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            std = (target.var(axis=-1, keepdims=True) + 1e-6) ** 0.5
            pred = pred.astype(jnp.float32) * std + mean  # undo target norm for display
        m = mask[..., None]
        recon_patches = jnp.where(m > 0, pred.astype(jnp.float32), target)
        masked_patches = jnp.where(m > 0, 0.5, target)
        c = x.shape[-1]

        def strip(patches):
            img = unpatchify(patches, gh, gw, p, p, c)
            img = img[..., :3] if c >= 3 else jnp.repeat(img[..., :1], 3, -1)
            return jnp.concatenate(list(img), axis=1)  # (H, B*W, 3)

        return {"original": strip(target), "masked": strip(masked_patches), "reconstruction": strip(recon_patches)}
