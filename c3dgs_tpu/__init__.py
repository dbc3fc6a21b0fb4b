"""c3dgs_tpu — a TPU-native 3D Gaussian Splatting training + compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the c3dgs
reference (compressed 3D Gaussian splatting: differentiable tile rasterizer,
sensitivity-aware vector quantization, quantization-aware finetuning,
Morton-ordered int8 containers), re-architected for TPU:

- fixed-shape, capacity-padded Gaussian state (`models.gaussians.GaussianScene`)
- a pure-JAX oracle renderer (`render.oracle`) and a Pallas tile renderer
  (`render.rasterizer`) whose alpha compositing runs as MXU matmuls
- deterministic, atomics-free backward (per-tile instance grads + segment-sum)
- weighted k-means VQ on the MXU (`compress.vq`)
- multi-device rendering/training via `jax.sharding` meshes (`parallel`)
"""

__version__ = "0.1.0"

# convenience top-level API
from .models.gaussians import GaussianScene, from_point_cloud  # noqa: E402,F401
from .render.types import RasterSettings, settings_from_intrinsic  # noqa: E402,F401
