from .types import RasterSettings  # noqa: F401
from .rasterizer import render  # noqa: F401
