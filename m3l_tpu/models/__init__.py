from .vtt import VTT, VTTConfig  # noqa: F401
from .vtmae import VTMAE  # noqa: F401
from .vit import (  # noqa: F401
    VisionTransformer,
    VisionTransformerPredictor,
    vit_tiny,
    vit_small,
    vit_base,
    vit_large,
    vit_giant2,
    vit_predictor,
    VIT_EMBED_DIMS,
)
