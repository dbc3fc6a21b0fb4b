"""Compression-ratio measurement on a 100k-gaussian synthetic scene.

Mirrors the reference's protocol: uncompressed 3DGS .ply size vs the
Morton-sorted int8 .npz, PSNR measured between uncompressed and compressed
renders over held-out views (the reference's <=0.5 dB criterion)."""
import math
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from c3dgs_tpu.compress.pipeline import to_compressed
from c3dgs_tpu.config import CompressionParams
from c3dgs_tpu.models import gaussians as gmod, io_npz, io_ply
from c3dgs_tpu.ops import losses as L
from c3dgs_tpu.render.types import RasterSettings
from c3dgs_tpu.train import trainer
from c3dgs_tpu.config import OptimizationParams
from c3dgs_tpu.train.finetune import finetune

N = int(os.environ.get("CR_N", 100_000))
rng = np.random.default_rng(0)

# trained-scene-like statistics: clustered positions, smooth SH (rest
# coefficients ~10x smaller than DC, like converged captures), lognormal
# scales, beta-ish opacities
centers = rng.normal(size=(40, 3)).astype(np.float32) * 2.0
pts = (centers[rng.integers(0, 40, N)] +
       rng.normal(size=(N, 3)).astype(np.float32) * 0.35)
pts[:, 2] += 6.0
cols = rng.random(size=(N, 3)).astype(np.float32)
scene = gmod.from_point_cloud(pts, cols, capacity=N, quantization=True)
k = scene.num_sh_coeffs
rest = rng.normal(size=(N, k - 1, 3)).astype(np.float32) * 0.03
scene = scene.replace(
    features_rest=jnp.asarray(rest),
    scaling_factor=scene.scaling_factor + math.log(0.5) +
        jnp.asarray(rng.normal(size=(N, 1)).astype(np.float32) * 0.3),
    opacity=jnp.asarray(rng.normal(loc=1.0, scale=1.5, size=(N, 1)).astype(np.float32)),
    active_sh_degree=3,
)
scene = scene.replace(quant=scene.update_observers().quant)

# cameras on a ring
class Cam:
    pass
cams = []
for i in range(8):
    a = 2 * math.pi * i / 8
    # look at the cloud center from a ring (cloud is at z=+6 in cam frame
    # for identity pose; just use small pose perturbations around identity)
    ev = np.asarray([0.05 * math.sin(a), 0.05 * math.cos(a), 0.0, 1.0,
                     0.6 * math.sin(a), 0.6 * math.cos(a), 0.0], np.float32)
    ev[:4] /= np.linalg.norm(ev[:4])
    c = Cam()
    c.extrinsic_vector = ev
    cams.append(c)

S = RasterSettings(width=800, height=800, tanfovx=math.tan(0.5),
                   tanfovy=math.tan(0.5), sh_degree=3)
bg = jnp.zeros(3)

render = jax.jit(lambda s, ev: trainer.render_scene(s, ev, S, bg)["render"])
gt_imgs = [render(scene, jnp.asarray(c.extrinsic_vector)) for c in cams]
jax.block_until_ready(gt_imgs[-1])
print("rendered baselines")

# give cameras intrinsics + images for calc_importance / finetune
for c, img in zip(cams, gt_imgs):
    intr = np.zeros((3, 3), np.float32)
    intr[0, 0] = 2 * math.atan(S.tanfovx)
    intr[1, 1] = 2 * math.atan(S.tanfovy)
    intr[0, 2] = S.width
    intr[1, 2] = S.height
    c.intrinsic = intr
    c.original_image = np.asarray(img)
    c.image_name = f"v{len(cams)}"

ply_path = "/tmp/cr_uncompressed.ply"
io_ply.save_gaussians_ply(scene, ply_path)
ply_size = os.path.getsize(ply_path)
print(f"uncompressed ply: {ply_size/1e6:.2f} MB")

comp = CompressionParams()
t0 = time.time()
compressed = to_compressed(scene, cams[:4], comp)
print(f"compressed in {time.time()-t0:.0f}s")

# short QAT finetune through the indexed renderer
compressed = finetune(
    compressed,
    cams,
    OptimizationParams(),
    iterations=int(os.environ.get("CR_FT", 150)),
    bg=bg,
    log_every=50,
)

npz_path = "/tmp/cr_compressed.npz"
io_npz.save_npz(compressed.morton_sorted(), npz_path)
npz_size = os.path.getsize(npz_path)

from c3dgs_tpu.eval.metrics import render_full
psnrs = []
for c, ref in zip(cams[4:], gt_imgs[4:]):
    out = render_full(compressed, jnp.asarray(c.extrinsic_vector), S, bg)
    psnrs.append(float(L.psnr(out["render"], ref)[0, 0]))
import json
print(f"splats kept: {int(compressed.num_active)} / {N}")
print(json.dumps({
    "metric": f"compression_ratio_{N}g",
    "value": round(ply_size / npz_size, 2),
    "unit": "x",
    "psnr_vs_uncompressed_db": round(float(np.mean(psnrs)), 2),
    "ply_mb": round(ply_size / 1e6, 2),
    "npz_mb": round(npz_size / 1e6, 2),
}))
