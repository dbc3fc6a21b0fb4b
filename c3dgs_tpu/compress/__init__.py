from .vq import CompressionSettings, vq_features, join_features  # noqa: F401
from .pipeline import compress_gaussians  # noqa: F401
