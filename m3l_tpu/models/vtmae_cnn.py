"""CNN-variant VTMAE: per-sensor conv towers, posmod-free embeddings.

Capability parity with the *intent* of the reference's CNN variant
(reference models/pretrain_models_cnn.py): separate EarlyCNN towers per
tactile sensor (:97-98,634-635) and a ``get_embeddings`` that skips
positional/modality embeddings and the transformer trunk, returning raw conv
tokens (:650-670, the pos/mod/transformer lines are commented out upstream).

Documented deviations (the upstream file is broken by construction —
SURVEY.md §2.1 notes): its training forward references a nonexistent
``early_conv_tactile`` attribute (:190) and its altered conv arithmetic
(5x5/s2/p0 conv2, :42) produces token counts that mismatch its own patch
targets. Here the per-sensor towers keep the shape-consistent kernel set so
both training and embeddings work end-to-end.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from ..nn.early_cnn import EarlyCNN
from .vtmae import VTMAE
from .vtt import VTT


class VTMAECnn(VTMAE):
    def __init__(self, encoder: VTT, *, embeddings_use_transformer: bool = False, rngs: nnx.Rngs, **kwargs):
        kwargs.setdefault("early_conv_masking", True)
        super().__init__(encoder, rngs=rngs, **kwargs)
        assert self.early_conv_masking
        self.embeddings_use_transformer = embeddings_use_transformer
        # replace the shared tactile tower with per-sensor towers
        dtype = self.dtype
        enc_dim = encoder.config.dim
        self.early_conv_tactile_towers = nnx.List(
            [
                EarlyCNN(encoder.stacked_tactile_channels, enc_dim, kind="tactile", dtype=dtype, rngs=rngs)
                for _ in range(encoder.config.num_tactiles)
            ]
        )

    def _tokens(self, x: dict, use_vision: bool, use_tactile: bool, image_patches, tactile_patches) -> jnp.ndarray:
        c = self.config
        parts = []
        if use_vision:
            img_tok = self.early_conv_vision(x["image"].astype(self.dtype))
            if self.use_sincosmod_encodings:
                img_tok = img_tok + self.encoder_modality_embedding.embedding[0]
                img_tok = img_tok + self._img_pos_enc.astype(img_tok.dtype)
            parts.append(img_tok)
        if c.num_tactiles > 0 and use_tactile:
            tac_tok = jnp.concatenate(
                [tower(x[f"tactile{i + 1}"].astype(self.dtype)) for i, tower in enumerate(self.early_conv_tactile_towers)], axis=1
            )
            if self.use_sincosmod_encodings:
                nt = c.num_tactile_patches_per_sensor
                mod = jnp.concatenate(
                    [jnp.broadcast_to(self.encoder_modality_embedding.embedding[1 + i], (nt, c.dim)) for i in range(c.num_tactiles)],
                    axis=0,
                )
                tac_tok = tac_tok + mod[None].astype(tac_tok.dtype) + self._tac_pos_enc.astype(tac_tok.dtype)
            parts.append(tac_tok)
        tokens = jnp.concatenate(parts, axis=1)
        if not self.use_sincosmod_encodings:
            tokens = tokens + self.encoder.pos_embedding[:, 1 : tokens.shape[1] + 1].astype(tokens.dtype)
        return tokens

    def get_embeddings(self, x: dict, use_vision: bool = True, use_tactile: bool = True) -> jnp.ndarray:
        """Raw conv tokens, no pos/modality embedding (reference :650-670)."""
        if "image" not in x:
            use_vision = False
        parts = []
        if use_vision:
            parts.append(self.early_conv_vision(x["image"].astype(self.dtype)))
        if self.config.num_tactiles > 0 and use_tactile:
            parts.extend(tower(x[f"tactile{i + 1}"].astype(self.dtype)) for i, tower in enumerate(self.early_conv_tactile_towers))
        tokens = jnp.concatenate(parts, axis=1)
        if self.embeddings_use_transformer:
            tokens = self.encoder.transformer(tokens)
        return tokens
