from .gaussians import GaussianScene  # noqa: F401
