from . import quat, sh, camera_math, losses, morton, quantize  # noqa: F401
