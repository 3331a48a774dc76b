from .vtt import VTT, VTTConfig  # noqa: F401
from .vtmae import VTMAE  # noqa: F401
