import math, time, functools
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.render.types import RasterSettings
from c3dgs_tpu.render import preprocess as pp, binning
from c3dgs_tpu.render.capacity import CapacityPolicy

n = 300_000
rng = np.random.default_rng(0)
pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
pts[:, 2] += 6.0
cols = rng.random(size=(n, 3)).astype(np.float32)
scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
scene = scene.replace(scaling_factor=scene.scaling_factor + math.log(0.15))
settings = RasterSettings(width=1920, height=1080, tanfovx=math.tan(0.6),
                          tanfovy=math.tan(0.6), sh_degree=3)
settings = CapacityPolicy(initial=1 << 19).apply(settings)
ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)

cov3d = scene.get_covariance()
op = scene.get_opacity().reshape(-1)
xyz = scene.xyz

@jax.jit
def prep_fn(xyz, cov3d, op, ev):
    return pp.preprocess(xyz, cov3d, op, ev, settings,
                         colors_precomp=jnp.zeros((n, 3), jnp.float32))

prep = jax.block_until_ready(prep_fn(xyz, cov3d, op, ev))

bin_jit = jax.jit(functools.partial(binning.bin_gaussians, settings=settings))
b = jax.block_until_ready(bin_jit(prep))
print("culled", int(b.culled), "of", int(b.num_instances),
      "grad_total", int(b.grad_total))

def timeit(f, *a, reps=20):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3

print("bin_gaussians ms:", round(timeit(bin_jit, prep), 3))

# isolate: boundary gather variant cost
cap, _ = settings.resolve_caps(n)
keep = np.zeros(cap, np.int32)
kc = jnp.asarray(np.cumsum(rng.random(cap) < 0.9).astype(np.int32))
cum = jnp.asarray(np.sort(rng.integers(0, cap, n)).astype(np.int32))

@jax.jit
def narrow(kc, cum):
    idx = jnp.clip(cum - 1, 0, cap - 1)
    return binning._row_gather(kc[:, None], idx)[:, 0]

@jax.jit
def packed8(kc, cum):
    idx = jnp.clip(cum - 1, 0, cap - 1)
    tbl = kc.reshape(cap // 8, 8)
    rows = binning._row_gather(tbl, idx >> 3)
    lane = jnp.arange(8, dtype=jnp.int32)[None]
    return jnp.sum(jnp.where(lane == (idx & 7)[:, None], rows, 0), axis=1)

print("narrow gather ms:", round(timeit(narrow, kc, cum), 3))
print("packed8 gather ms:", round(timeit(packed8, kc, cum), 3))
np.testing.assert_array_equal(np.asarray(narrow(kc, cum)), np.asarray(packed8(kc, cum)))
print("equal ok")
