from .transformer import Attention, FeedForward, Transformer  # noqa: F401
from .early_cnn import EarlyCNN  # noqa: F401
from .vit_layers import (  # noqa: F401
    Attention as ViTAttention,
    Block,
    CrossAttention,
    CrossAttentionBlock,
    DINOHead,
    LayerScale,
    Mlp,
    PatchEmbed,
    PatchEmbed3D,
    SwiGLUFFN,
)
from .gumbel_vq import GumbelVectorQuantizer  # noqa: F401
