"""Config-friendly builder functions (``_target_``s for the YAML tree).

The reference's Hydra tree instantiates torch modules directly; nnx modules
need an Rngs stream, so the YAML targets point at these builders, which take
plain scalars (+ a seed) and wire encoders/algorithms/probes together.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import nnx

from ..models import vit as vit_zoo

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_vit(
    size: str = "small",
    *,
    patch_size: int = 16,
    img_size: Sequence[int] = (224, 224),
    in_chans: int = 6,
    num_register_tokens: int = 1,
    pos_embed_fn: str = "sinusoidal",
    num_frames: int = 1,
    tubelet_size: int = 2,
    depth: Optional[int] = None,
    compute_dtype: str = "float32",
    seed: int = 0,
):
    factory = getattr(vit_zoo, f"vit_{size}")
    kwargs = dict(
        img_size=tuple(img_size),
        in_chans=in_chans,
        pos_embed_fn=pos_embed_fn,
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        dtype=_DTYPES[compute_dtype],
    )
    if depth is not None:
        kwargs["depth"] = depth
    return factory(patch_size=patch_size, num_register_tokens=num_register_tokens, rngs=nnx.Rngs(seed), **kwargs)


def build_predictor(encoder, *, embed_dim: int = 384, depth: int = 6, num_heads: int = 12, num_mask_tokens: int = 1, seed: int = 1):
    return vit_zoo.vit_predictor(
        input_dim=encoder.embed_dim,
        patch_size=encoder.patch_size,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        img_size=encoder.img_size,
        in_chans=encoder.in_chans,
        num_frames=encoder.num_frames,
        tubelet_size=encoder.tubelet_size,
        num_mask_tokens=num_mask_tokens,
        rngs=nnx.Rngs(seed),
    )


def build_mae(encoder, *, seed: int = 1, **kwargs):
    from ..ssl import MAEModule

    return MAEModule(encoder, rngs=nnx.Rngs(seed), **kwargs)


def build_dino(encoder, *, seed: int = 1, **kwargs):
    from ..ssl import DINOModule

    return DINOModule(encoder, rngs=nnx.Rngs(seed), **kwargs)


def build_dinov2(encoder, *, seed: int = 1, **kwargs):
    from ..ssl import DINOv2Module

    return DINOv2Module(encoder, rngs=nnx.Rngs(seed), **kwargs)


def build_ijepa(encoder, *, predictor_depth: int = 6, predictor_dim: int = 384, num_target_masks: int = 4, seed: int = 1, **kwargs):
    from ..ssl import IJEPAModule

    predictor = build_predictor(encoder, embed_dim=predictor_dim, depth=predictor_depth, num_mask_tokens=num_target_masks, seed=seed + 1)
    return IJEPAModule(encoder, predictor, num_target_masks=num_target_masks, rngs=nnx.Rngs(seed), **kwargs)


def build_vjepa(encoder, *, predictor_depth: int = 6, predictor_dim: int = 384, seed: int = 1, **kwargs):
    from ..ssl import VJEPAModule

    predictor = build_predictor(encoder, embed_dim=predictor_dim, depth=predictor_depth, seed=seed + 1)
    return VJEPAModule(encoder, predictor, rngs=nnx.Rngs(seed), **kwargs)


_PROBES = {
    "force": ("ForceLinearProbe", "ForceSLModule"),
    "slip": ("SlipProbe", "SlipSLModule"),
    "pose": ("PoseLinearProbe", "PoseSLModule"),
    "grasp": ("GraspLinearProbe", "GraspSLModule"),
    "textile": ("TextileLinearProbe", "TextileSLModule"),
}


def build_task_module(
    encoder,
    task: str,
    *,
    checkpoint_encoder: Optional[str] = None,
    encoder_type: str = "mae",
    train_encoder: bool = False,
    num_classes: Optional[int] = None,
    num_heads: int = 12,
    seed: int = 2,
    **kwargs,
):
    import m3l_tpu.tasks as tasks

    probe_name, module_name = _PROBES[task]
    probe_kwargs = dict(num_heads=num_heads, rngs=nnx.Rngs(seed))
    if num_classes is not None:
        probe_kwargs["num_classes"] = num_classes
    probe = getattr(tasks, probe_name)(encoder.embed_dim, **probe_kwargs)
    module_cls = getattr(tasks, module_name)
    return module_cls(
        encoder,
        probe,
        checkpoint_encoder=checkpoint_encoder,
        encoder_type=encoder_type,
        train_encoder=train_encoder,
        **kwargs,
    )


def build_forcefield_module(
    encoder,
    *,
    geometric: bool = True,
    hooks: Sequence[int] = (2, 5, 8, 11),
    fusion_ch: int = 128,
    seed: int = 2,
    **kwargs,
):
    """Force-field task over ViT intermediate layers (reference
    config/task/digit_forcefield.yaml task block): DPT decoder +
    GeometricForceFieldModule (pose estimation + depth reprojection SSL) or
    the plain flow-SSL ForceFieldModule when geometric=False."""
    from ..tasks import ForceFieldDecoder, ForceFieldModule, GeometricForceFieldModule

    hooks = [h for h in hooks if h < len(encoder.blocks)] or [len(encoder.blocks) - 1]
    dec = ForceFieldDecoder(encoder, hooks=hooks, fusion_ch=fusion_ch, rngs=nnx.Rngs(seed))
    if geometric:
        return GeometricForceFieldModule(dec, rngs=nnx.Rngs(seed + 1), **kwargs)
    return ForceFieldModule(dec, **kwargs)


def build_trainer(**kwargs):
    from .trainer import Trainer

    return Trainer(**kwargs)
