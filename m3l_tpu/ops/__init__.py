from .posenc import sincos_2d, sincos_nd, learned_like_sincos_shape  # noqa: F401
from .patches import patchify, unpatchify  # noqa: F401
from .masking import random_modal_masking, restore_tokens  # noqa: F401
