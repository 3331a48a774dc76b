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
from .multimodal_vtt import MultimodalVTT  # noqa: F401
from .vtmae_cnn import VTMAECnn  # noqa: F401
from .dinov2_interop import DINOv2Backbone, dinov2_vits14, load_torch_dinov2_state  # noqa: F401
from .multimodal_transformer import MultimodalTransformer, MultimodalMAEDecoder  # noqa: F401
from .baselines import ResNet18Encoder, AlexNetEncoder  # noqa: F401
from .dinov2_interop import DINOv2LinearSegHead, load_torch_linear_seg_head  # noqa: F401
