from .transformer import Attention, FeedForward, Transformer  # noqa: F401
from .early_cnn import EarlyCNN  # noqa: F401
