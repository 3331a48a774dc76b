"""DINOv2-style VisionTransformer zoo.

Capability parity with the reference's ViT
(reference tactile_ssl/model/vision_transformer.py:56-606): conv patch embed
(2D, or 3D tubelets for 2-frame tactile "video"), sinusoidal or learned
positional embedding with resize interpolation for off-size inputs, register
tokens (no CLS — registers play that role, :137-152), pre-norm blocks with
LayerScale + stochastic depth, ``forward_features`` returning
``{x_norm_regtokens, x_norm_patchtokens, x_prenorm, masks}`` (:341-356), a
mask-token predictor variant (:425-491), and tiny/small/base/large/giant2
factories (:528-604).

TPU-first masking: the reference gathers kept tokens with ``apply_masks``
(variable lengths batched via xformers BlockDiagonalMask); here masks come
in two static-shape forms:

* ``mask_indices`` (B, K) int — gather exactly K tokens (K is
  config-determined, e.g. I-JEPA context blocks);
* ``key_mask`` (B, N) bool — keep the full sequence and mask attention keys
  (pad-and-mask), used for the variable-area DINO block masks so every step
  compiles to the same program (SURVEY.md §7 hard-part #4).
"""
from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn.vit_layers import LN_EPS, Block, PatchEmbed, PatchEmbed3D
from ..ops.posenc import sincos_nd

VIT_EMBED_DIMS = {
    "vit_tiny": 192,
    "vit_small": 384,
    "vit_base": 768,
    "vit_large": 1024,
    "vit_giant2": 1536,
}


class VisionTransformer(nnx.Module):
    def __init__(
        self,
        *,
        img_size=(224, 224),
        patch_size: int = 16,
        num_frames: int = 1,
        tubelet_size: int = 2,
        in_chans: int = 3,
        embed_dim: int = 768,
        depth: int = 12,
        num_heads: int = 12,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        ffn_bias: bool = True,
        proj_bias: bool = True,
        drop_path_rate: float = 0.0,
        drop_path_uniform: bool = False,
        init_values: Optional[float] = 1.0,
        pos_embed_fn: Literal["sinusoidal", "learned"] = "learned",
        ffn_layer: str = "mlp",
        num_register_tokens: int = 0,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.in_chans = in_chans
        self.embed_dim = self.num_features = embed_dim
        self.n_blocks = depth
        self.num_heads = num_heads
        self.num_register_tokens = num_register_tokens
        self.num_frames = num_frames
        self.tubelet_size = tubelet_size
        self.is_video = num_frames > 1
        self.pos_embed_fn = pos_embed_fn
        self.dtype = dtype

        if self.is_video:
            self.patch_embed = PatchEmbed3D(num_frames, tubelet_size, img_size, patch_size, in_chans, embed_dim, dtype=dtype, rngs=rngs)
        else:
            self.patch_embed = PatchEmbed(img_size, patch_size, in_chans, embed_dim, dtype=dtype, rngs=rngs)
        self.num_patches = self.patch_embed.num_patches

        self.register_tokens = (
            nnx.Param(jax.random.normal(rngs.params(), (1, num_register_tokens, embed_dim), jnp.float32) * 1e-6)
            if num_register_tokens
            else None
        )
        if pos_embed_fn == "sinusoidal":
            self._pos_table = nnx.data(sincos_nd(self.patch_embed.grid, embed_dim))
        else:
            init = jax.nn.initializers.truncated_normal(0.02)
            self.pos_embed = nnx.Param(init(rngs.params(), (1, self.num_patches, embed_dim), jnp.float32))

        dpr = [drop_path_rate] * depth if drop_path_uniform else [float(x) for x in jnp.linspace(0, drop_path_rate, depth)]
        self.blocks = nnx.List(
            [
                Block(
                    embed_dim,
                    num_heads,
                    mlp_ratio=mlp_ratio,
                    qkv_bias=qkv_bias,
                    proj_bias=proj_bias,
                    ffn_bias=ffn_bias,
                    drop_path_rate=dpr[i],
                    init_values=init_values,
                    ffn_layer=ffn_layer,
                    dtype=dtype,
                    rngs=rngs,
                )
                for i in range(depth)
            ]
        )
        self.norm = nnx.LayerNorm(embed_dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    # ------------------------------------------------------------------ #
    def pos_encoding(self, x_shape) -> jnp.ndarray:
        """Positional table matching the (static) input spatial size
        (reference :252-298 interpolation semantics)."""
        if self.is_video:
            _, t, h, w, _ = x_shape
            grid = (t // self.tubelet_size, h // self.patch_size, w // self.patch_size)
        else:
            _, h, w, _ = x_shape
            grid = (h // self.patch_size, w // self.patch_size)
        if grid == tuple(self.patch_embed.grid):
            table = self._pos_table if self.pos_embed_fn == "sinusoidal" else self.pos_embed[...][0]
            return table
        if self.pos_embed_fn == "sinusoidal":
            return sincos_nd(grid, self.embed_dim)
        base = self.pos_embed[...][0].reshape(*self.patch_embed.grid, self.embed_dim)
        resized = jax.image.resize(base.astype(jnp.float32), (*grid, self.embed_dim), method="bicubic")
        return resized.reshape(-1, self.embed_dim)

    def prepare_tokens_with_masks(self, x, mask_indices: Optional[jnp.ndarray] = None, key_mask: Optional[jnp.ndarray] = None):
        pos = self.pos_encoding(x.shape)
        tokens = self.patch_embed(x.astype(self.dtype))
        tokens = tokens + pos[None].astype(tokens.dtype)
        if mask_indices is not None:
            tokens = jnp.take_along_axis(tokens, mask_indices[:, :, None], axis=1)
        full_key_mask = None
        if key_mask is not None:
            full_key_mask = key_mask
        if self.register_tokens is not None:
            regs = jnp.broadcast_to(self.register_tokens[...], (tokens.shape[0], self.num_register_tokens, self.embed_dim)).astype(tokens.dtype)
            tokens = jnp.concatenate([regs, tokens], axis=1)
            if full_key_mask is not None:
                ones = jnp.ones((tokens.shape[0], self.num_register_tokens), bool)
                full_key_mask = jnp.concatenate([ones, full_key_mask], axis=1)
        return tokens, full_key_mask

    def _run_blocks(self, x, key_mask=None, dp_key: Optional[jax.Array] = None):
        keys = jax.random.split(dp_key, len(self.blocks)) if dp_key is not None else [None] * len(self.blocks)
        for blk, k in zip(self.blocks, keys):
            x = blk(x, key_mask, k)
        return x

    def forward_features(
        self,
        x,
        mask_indices: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,
        dp_key: Optional[jax.Array] = None,
    ) -> dict:
        tokens, km = self.prepare_tokens_with_masks(x, mask_indices, key_mask)
        out = self._run_blocks(tokens, km, dp_key)
        x_norm = self.norm(out)
        r = self.num_register_tokens
        return {
            "x_norm_regtokens": x_norm[:, :r],
            "x_norm_patchtokens": x_norm[:, r:],
            "x_prenorm": out,
            "masks": mask_indices if mask_indices is not None else key_mask,
        }

    def forward_features_multimask(self, x, key_masks: jnp.ndarray, dp_key: Optional[jax.Array] = None) -> dict:
        """Run M masks per sample in one batched pass.

        ``key_masks``: (M, B, N) bool. Tokens are embedded once and tiled to
        (M*B, ...) in the reference's ``(p b)`` concat order
        (tactile_ssl/utils/__init__.py:25-36 apply_masks + dino.py:347)."""
        m, b, n = key_masks.shape
        pos = self.pos_encoding(x.shape)
        tokens = self.patch_embed(x.astype(self.dtype)) + pos[None].astype(self.dtype)
        tokens = jnp.tile(tokens, (m, 1, 1))  # (M*B, N, D), mask-major
        km = key_masks.reshape(m * b, n)
        if self.register_tokens is not None:
            regs = jnp.broadcast_to(self.register_tokens[...], (m * b, self.num_register_tokens, self.embed_dim)).astype(tokens.dtype)
            tokens = jnp.concatenate([regs, tokens], axis=1)
            km = jnp.concatenate([jnp.ones((m * b, self.num_register_tokens), bool), km], axis=1)
        out = self._run_blocks(tokens, km, dp_key)
        x_norm = self.norm(out)
        r = self.num_register_tokens
        return {
            "x_norm_regtokens": x_norm[:, :r],
            "x_norm_patchtokens": x_norm[:, r:],
            "x_prenorm": out,
            "masks": key_masks,
        }

    def get_intermediate_layers(self, x, n=1, reshape: bool = False, return_class_token: bool = False, norm: bool = True):
        """Outputs of the last n blocks (or the listed block indices)
        (reference :392-418)."""
        tokens, _ = self.prepare_tokens_with_masks(x)
        idx = list(range(len(self.blocks) - n, len(self.blocks))) if isinstance(n, int) else list(n)
        outputs = []
        cur = tokens
        for i, blk in enumerate(self.blocks):
            cur = blk(cur)
            if i in idx:
                outputs.append(cur)
        if norm:
            outputs = [self.norm(o) for o in outputs]
        r = self.num_register_tokens
        cls = [o[:, :r] for o in outputs]
        outputs = [o[:, r:] for o in outputs]
        if reshape:
            b = x.shape[0]
            gh = x.shape[-3] // self.patch_size if not self.is_video else self.patch_embed.grid[1]
            gw = x.shape[-2] // self.patch_size if not self.is_video else self.patch_embed.grid[2]
            outputs = [o.reshape(b, gh, gw, -1).transpose(0, 3, 1, 2) for o in outputs]
        if return_class_token:
            return tuple(zip(outputs, cls))
        return tuple(outputs)

    def __call__(self, x, **kwargs):
        return self.forward_features(x, **kwargs)["x_norm_patchtokens"]


class VisionTransformerPredictor(VisionTransformer):
    """Narrow predictor over context tokens + mask tokens (I-JEPA style,
    reference :425-491). Input/output projected to/from ``input_dim``."""

    def __init__(self, *, input_dim: int, num_mask_tokens: int = 1, zero_init_mask_tokens: bool = False, rngs: nnx.Rngs, **kwargs):
        kwargs.setdefault("pos_embed_fn", "sinusoidal")
        super().__init__(rngs=rngs, **kwargs)
        self.input_dim = input_dim
        self.num_mask_tokens = num_mask_tokens
        self.input_projection = nnx.Linear(input_dim, self.embed_dim, param_dtype=jnp.float32, dtype=self.dtype, rngs=rngs)
        self.output_projection = nnx.Linear(self.embed_dim, input_dim, param_dtype=jnp.float32, dtype=self.dtype, rngs=rngs)
        init = jnp.zeros if zero_init_mask_tokens else (lambda shape, dt: jax.random.truncated_normal(rngs.params(), -2, 2, shape, dt) * 0.02)
        self.mask_tokens = nnx.List([nnx.Param(init((1, self.embed_dim), jnp.float32)) for _ in range(num_mask_tokens)])

    def predict(self, context_tokens: jnp.ndarray, context_indices: jnp.ndarray, target_indices: jnp.ndarray, mask_index: int = 1):
        """context_tokens: (B, Kc, input_dim) encoder latents of the context
        block; predicts latents at ``target_indices`` (B, Kt)."""
        b, kc, _ = context_tokens.shape
        x = self.input_projection(context_tokens.astype(self.dtype))
        pos = self.pos_encoding((b, *self.img_size, self.in_chans) if not self.is_video else (b, self.num_frames, *self.img_size, self.in_chans))
        pos_b = jnp.broadcast_to(pos[None], (b, pos.shape[0], self.embed_dim))
        x = x + jnp.take_along_axis(pos_b, context_indices[:, :, None], axis=1).astype(x.dtype)
        mask_token = self.mask_tokens[mask_index % self.num_mask_tokens][...]
        pred = jnp.broadcast_to(mask_token[None], (b, target_indices.shape[1], self.embed_dim)).astype(x.dtype)
        pred = pred + jnp.take_along_axis(pos_b, target_indices[:, :, None], axis=1).astype(x.dtype)
        x = jnp.concatenate([x, pred], axis=1)
        x = self._run_blocks(x)
        x = self.norm(x)[:, kc:]
        return self.output_projection(x)

    def predict_padded(self, context_tokens: jnp.ndarray, context_mask: jnp.ndarray, mask_index: int = 0):
        """Pad-and-mask variant: full-length context tokens (B, N, input_dim)
        with a boolean keep-mask, plus a full bank of N mask tokens; returns
        predictions for ALL N positions (the caller weights the loss by its
        target mask). One static program for any block geometry."""
        b, n, _ = context_tokens.shape
        x = self.input_projection(context_tokens.astype(self.dtype))
        pos = self.pos_encoding((b, *self.img_size, self.in_chans) if not self.is_video else (b, self.num_frames, *self.img_size, self.in_chans))
        x = x + pos[None].astype(x.dtype)
        mask_token = self.mask_tokens[mask_index % self.num_mask_tokens][...]
        pred = jnp.broadcast_to(mask_token[None], (b, n, self.embed_dim)).astype(x.dtype) + pos[None].astype(x.dtype)
        seq = jnp.concatenate([x, pred], axis=1)
        # keys: context part masked by context_mask; prediction tokens visible
        km = jnp.concatenate([context_mask, jnp.ones((b, n), bool)], axis=1)
        out = self._run_blocks(seq, km)
        out = self.norm(out)[:, n:]
        return self.output_projection(out)


def _factory(embed_dim, depth, num_heads):
    def make(patch_size=16, num_register_tokens=0, *, rngs: nnx.Rngs, **kwargs):
        return VisionTransformer(
            patch_size=patch_size,
            embed_dim=embed_dim,
            depth=kwargs.pop("depth", depth),
            num_heads=num_heads,
            mlp_ratio=4.0,
            num_register_tokens=num_register_tokens,
            rngs=rngs,
            **kwargs,
        )

    return make


vit_tiny = _factory(192, 12, 3)
vit_small = _factory(384, 12, 6)
vit_base = _factory(768, 12, 12)
vit_large = _factory(1024, 24, 16)
vit_giant2 = _factory(1536, 40, 24)


def vit_predictor(input_dim: int, patch_size=16, num_register_tokens=0, embed_dim=384, depth=6, num_heads=12, *, rngs: nnx.Rngs, **kwargs):
    return VisionTransformerPredictor(
        input_dim=input_dim,
        patch_size=patch_size,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=4.0,
        num_register_tokens=num_register_tokens,
        rngs=rngs,
        **kwargs,
    )
