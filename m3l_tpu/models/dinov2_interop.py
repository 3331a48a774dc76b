"""DINOv2 backbone (CLS + registers) with torch-checkpoint interop.

The reference loads ``dinov2_vits14_reg`` from torch.hub, freezes it, and
uses its CLS feature per crop in the DINO-feature PPO policies
(reference trainDINO.py:142-144, models/pretrain_policy.py:39-120). This
module provides:

* :class:`DINOv2Backbone` — the real DINOv2 layout (CLS token + 4 register
  tokens + patch tokens, learned pos-embed over CLS+patches with bicubic
  interpolation, LayerScale init 1e-5, pre-norm blocks);
* :func:`load_torch_dinov2_state` — key-mapped loading of a torch DINOv2
  state dict (.pth) into the JAX module (SURVEY.md §7 hard-parts #6/#7).

In this zero-egress environment hub weights cannot be fetched; pass a local
``.pth`` when available, otherwise the backbone is randomly initialized (the
PPO path stays functional, feature quality differs — documented).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..nn.vit_layers import LN_EPS, Block, PatchEmbed


class DINOv2Backbone(nnx.Module):
    def __init__(
        self,
        *,
        img_size=(518, 518),
        patch_size: int = 14,
        in_chans: int = 3,
        embed_dim: int = 384,
        depth: int = 12,
        num_heads: int = 6,
        mlp_ratio: float = 4.0,
        num_register_tokens: int = 4,
        init_values: float = 1e-5,
        ffn_layer: str = "mlp",
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.embed_dim = embed_dim
        self.num_register_tokens = num_register_tokens
        self.dtype = dtype
        self.patch_embed = PatchEmbed(img_size, patch_size, in_chans, embed_dim, dtype=dtype, rngs=rngs)
        self.cls_token = nnx.Param(jnp.zeros((1, 1, embed_dim), jnp.float32))
        self.register_tokens = (
            nnx.Param(jnp.zeros((1, num_register_tokens, embed_dim), jnp.float32)) if num_register_tokens else None
        )
        # learned pos-embed over [CLS] + patches (registers get none)
        self.pos_embed = nnx.Param(
            jax.random.truncated_normal(rngs.params(), -2, 2, (1, 1 + self.patch_embed.num_patches, embed_dim), jnp.float32) * 0.02
        )
        self.blocks = nnx.List(
            [
                Block(embed_dim, num_heads, mlp_ratio=mlp_ratio, init_values=init_values, ffn_layer=ffn_layer, dtype=dtype, rngs=rngs)
                for _ in range(depth)
            ]
        )
        self.norm = nnx.LayerNorm(embed_dim, epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def _interp_pos(self, grid):
        pos = self.pos_embed[...][0]
        cls_pos, patch_pos = pos[:1], pos[1:]
        if grid == tuple(self.patch_embed.grid):
            return cls_pos, patch_pos
        base = patch_pos.reshape(*self.patch_embed.grid, self.embed_dim)
        resized = jax.image.resize(base.astype(jnp.float32), (*grid, self.embed_dim), method="bicubic")
        return cls_pos, resized.reshape(-1, self.embed_dim)

    def forward_features(self, x: jnp.ndarray) -> dict:
        b, h, w, _ = x.shape
        grid = (h // self.patch_size, w // self.patch_size)
        tokens = self.patch_embed(x.astype(self.dtype))
        cls_pos, patch_pos = self._interp_pos(grid)
        tokens = tokens + patch_pos[None].astype(tokens.dtype)
        cls = jnp.broadcast_to(self.cls_token[...].astype(tokens.dtype), (b, 1, self.embed_dim)) + cls_pos[None].astype(tokens.dtype)
        parts = [cls]
        if self.register_tokens is not None:
            parts.append(jnp.broadcast_to(self.register_tokens[...].astype(tokens.dtype), (b, self.num_register_tokens, self.embed_dim)))
        seq = jnp.concatenate(parts + [tokens], axis=1)
        for blk in self.blocks:
            seq = blk(seq)
        x_norm = self.norm(seq)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": x_norm[:, 0],
            "x_norm_regtokens": x_norm[:, 1 : 1 + r],
            "x_norm_patchtokens": x_norm[:, 1 + r :],
            "x_prenorm": seq,
        }

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """CLS feature, matching torch-hub dinov2's ``forward`` used by the
        reference extractor (pretrain_policy.py:105-118)."""
        return self.forward_features(x)["x_norm_clstoken"]


def dinov2_vits14(num_register_tokens: int = 4, img_size=(518, 518), *, rngs: nnx.Rngs, **kw) -> DINOv2Backbone:
    kw.setdefault("depth", 12)
    return DINOv2Backbone(img_size=img_size, patch_size=14, embed_dim=384, num_heads=6, num_register_tokens=num_register_tokens, rngs=rngs, **kw)


def load_torch_dinov2_state(model: DINOv2Backbone, state_dict: dict) -> int:
    """Copy a torch DINOv2 state dict into the JAX backbone.

    Accepts either raw tensors or numpy arrays. Returns the number of
    parameters loaded. Key surgery mirrors sl_module.py:81-103-style
    prefix handling (strips leading 'backbone.')."""

    def np_(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k.removeprefix("backbone."): np_(v) for k, v in state_dict.items()}
    loaded = 0

    def set_(param, value):
        nonlocal loaded
        assert param[...].shape == value.shape, (param[...].shape, value.shape)
        param[...] = jnp.asarray(value, param[...].dtype)
        loaded += value.size

    set_(model.cls_token, sd["cls_token"])
    if model.register_tokens is not None and "register_tokens" in sd:
        set_(model.register_tokens, sd["register_tokens"])
    set_(model.pos_embed, sd["pos_embed"])
    # torch conv OIHW -> flax HWIO
    set_(model.patch_embed.proj.kernel, sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    set_(model.patch_embed.proj.bias, sd["patch_embed.proj.bias"])
    for i, blk in enumerate(model.blocks):
        p = f"blocks.{i}."
        set_(blk.norm1.scale, sd[p + "norm1.weight"])
        set_(blk.norm1.bias, sd[p + "norm1.bias"])
        set_(blk.attn.qkv.kernel, sd[p + "attn.qkv.weight"].T)
        set_(blk.attn.qkv.bias, sd[p + "attn.qkv.bias"])
        set_(blk.attn.proj.kernel, sd[p + "attn.proj.weight"].T)
        set_(blk.attn.proj.bias, sd[p + "attn.proj.bias"])
        set_(blk.ls1.gamma, sd[p + "ls1.gamma"])
        set_(blk.norm2.scale, sd[p + "norm2.weight"])
        set_(blk.norm2.bias, sd[p + "norm2.bias"])
        set_(blk.mlp.fc1.kernel, sd[p + "mlp.fc1.weight"].T)
        set_(blk.mlp.fc1.bias, sd[p + "mlp.fc1.bias"])
        set_(blk.mlp.fc2.kernel, sd[p + "mlp.fc2.weight"].T)
        set_(blk.mlp.fc2.bias, sd[p + "mlp.fc2.bias"])
        set_(blk.ls2.gamma, sd[p + "ls2.gamma"])
    set_(model.norm.scale, sd["norm.weight"])
    set_(model.norm.bias, sd["norm.bias"])
    return loaded


class DINOv2LinearSegHead(nnx.Module):
    """mmseg-style linear segmentation head over DINOv2 patch tokens: a
    (frozen-stats) BatchNorm over the feature dim followed by a 1x1 conv to
    the class logits — the layout of the reference's shipped
    ``dino_head/dinov2_vits14_*_linear_head.pth`` assets (SURVEY.md §2.6,
    BASELINE.json config #5)."""

    def __init__(self, embed_dim: int = 384, num_classes: int = 150, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.embed_dim = embed_dim
        self.num_classes = num_classes
        self.bn_scale = nnx.Param(jnp.ones((embed_dim,), jnp.float32))
        self.bn_bias = nnx.Param(jnp.zeros((embed_dim,), jnp.float32))
        self.bn_mean = nnx.Param(jnp.zeros((embed_dim,), jnp.float32))
        self.bn_var = nnx.Param(jnp.ones((embed_dim,), jnp.float32))
        self.conv_seg = nnx.Linear(embed_dim, num_classes, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, patch_tokens: jnp.ndarray, grid: tuple[int, int] | None = None) -> jnp.ndarray:
        """(B, N, D) patch tokens -> (B, N, classes) logits (or (B, gh, gw, C)
        when ``grid`` is given)."""
        x = patch_tokens.astype(jnp.float32)
        x = (x - self.bn_mean[...]) / jnp.sqrt(self.bn_var[...] + 1e-5)
        x = x * self.bn_scale[...] + self.bn_bias[...]
        logits = self.conv_seg(x)
        if grid is not None:
            b = logits.shape[0]
            return logits.reshape(b, *grid, self.num_classes)
        return logits


def load_torch_linear_seg_head(head: DINOv2LinearSegHead, checkpoint: dict) -> int:
    """Load an mmseg linear-head checkpoint ({'state_dict': ...} or a bare
    state dict) into :class:`DINOv2LinearSegHead`."""

    def np_(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = checkpoint.get("state_dict", checkpoint)
    sd = {k.removeprefix("decode_head."): np_(v) for k, v in sd.items()}
    loaded = 0

    def set_(param, value):
        nonlocal loaded
        assert param[...].shape == value.shape, (param[...].shape, value.shape)
        param[...] = jnp.asarray(value, jnp.float32)
        loaded += value.size

    set_(head.bn_scale, sd["bn.weight"])
    set_(head.bn_bias, sd["bn.bias"])
    set_(head.bn_mean, sd["bn.running_mean"])
    set_(head.bn_var, sd["bn.running_var"])
    # (classes, D, 1, 1) conv1x1 -> (D, classes) linear kernel
    set_(head.conv_seg.kernel, sd["conv_seg.weight"][:, :, 0, 0].T)
    set_(head.conv_seg.bias, sd["conv_seg.bias"])
    return loaded
