"""MAE (+/-) frozen-DINO fused feature extractors.

Capability parity with the reference's DINO⊕MAE extractors:

* :class:`DinoCatMAEFeatures` (reference
  models/pretrain_models_dino_cat_mae.py:788-904): MAE embeddings ->
  depth-1 transformer -> mean pool, concatenated with the frozen DINO CLS
  feature of the MIDDLE stacked frame (:884-898, channels
  ``3*mid-3 : 3*mid``), fused by a 3-layer MLP (:829-839). The learnable-
  query weighted pooling (:838-866) is provided but — as upstream — not on
  the default path.
* tactile-only-MAE variant (reference models/pretrain_models_DINO_tac_MAE.py):
  same fusion but the MAE runs tactile-only (``use_vision=False``); pass
  ``tactile_only_mae=True``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.vtmae import VTMAE
from ..nn.transformer import Transformer
from ..utils.obs import vt_load


class DinoCatMAEFeatures(nnx.Module):
    def __init__(
        self,
        mae: VTMAE,
        dino_encoder,
        dim: int,
        *,
        dino_dim: int = 384,
        vision_only_control: bool = False,
        tactile_only_mae: bool = False,
        frame_stack: int = 1,
        dino_crop: int = 70,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.mae = mae
        self.dino_encoder = dino_encoder
        self.dim = dim
        self.vision_only_control = vision_only_control
        self.tactile_only_mae = tactile_only_mae
        self.frame_stack = frame_stack
        self.dino_crop = dino_crop
        self.post = Transformer(dim, depth=1, heads=4, dim_head=64, mlp_dim=dim * 2, dtype=dtype, rngs=rngs)
        fused = dim + dino_dim
        lin = lambda i, o: nnx.Linear(i, o, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.mlp1, self.mlp2, self.mlp3 = lin(fused, fused), lin(fused, fused), lin(fused, dim)
        # learnable-query pooling (reference :838-866; off the default path)
        self.query = nnx.Param(jax.random.normal(rngs.params(), (1, 1, dim), jnp.float32))
        self.query_projection = lin(dim, dim)
        self.key_projection = lin(dim, dim)

    def weighted_pooling(self, tokens: jnp.ndarray) -> jnp.ndarray:
        b = tokens.shape[0]
        q = self.query_projection(jnp.broadcast_to(self.query[...], (b, 1, self.dim)).astype(tokens.dtype))
        k = self.key_projection(tokens)
        scores = jnp.einsum("bqd,bnd->bqn", q, k) / math.sqrt(self.dim)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(tokens.dtype)
        return jnp.einsum("bqn,bnd->bqd", w, tokens)[:, 0]

    def from_packed(self, x: dict) -> jnp.ndarray:
        emb = self.mae.get_embeddings(
            {k: v for k, v in x.items() if not (self.tactile_only_mae and k == "image")},
            use_tactile=not self.vision_only_control,
        )
        z = jnp.mean(self.post(emb), axis=1)  # (B, dim)
        # frozen DINO CLS of the middle stacked frame
        mid = max(self.frame_stack // 2, 1)
        img = x["image"]  # (B, H, W, 3*fs), frame-major channels
        crop = img[..., 3 * mid - 3 : 3 * mid]
        if crop.shape[1] != self.dino_crop:
            b = crop.shape[0]
            crop = jax.image.resize(crop, (b, self.dino_crop, self.dino_crop, 3), method="bilinear")
        dino_feat = jax.lax.stop_gradient(self.dino_encoder(crop)).astype(z.dtype)
        fused = jnp.concatenate([z, dino_feat], axis=-1)
        h = nnx.relu(self.mlp1(fused))
        h = nnx.relu(self.mlp2(h))
        return self.mlp3(h)

    def mae_loss(self, x: dict, key: jax.Array) -> jnp.ndarray:
        if self.tactile_only_mae:
            x = {k: v for k, v in x.items() if k != "image"}
        return self.mae(x, key)

    def __call__(self, obs: dict) -> jnp.ndarray:
        return self.from_packed(vt_load(obs, frame_stack=self.frame_stack))
