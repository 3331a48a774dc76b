from .gae import compute_gae  # noqa: F401
from .vecnorm import RewardNormalizer  # noqa: F401
