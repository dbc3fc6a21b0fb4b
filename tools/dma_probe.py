"""Mosaic DMA-shape probe for the (CHUNK, PIX)-oriented backward design.

Answers, on the real chip, which HBM<->VMEM copies Mosaic accepts:
  1. (CHUNK, 16) slice of a (cap, 16) f32 array  — fields pre-transposed
     by XLA, consumed as (CHUNK, k) columns with NO in-kernel transpose;
  2. (8, 512) block of a (T, 8, 512) array       — per-tile slim blocks in
     natural row-major layout (no XLA pre-transpose, no 16-tile grouping);
  3. in-kernel (16, CHUNK) -> (CHUNK, 16) transpose cost, the fallback if
     (1) is rejected.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def probe1():
    """(CHUNK, 16) slices from (cap, 16) HBM."""
    cap = 1024

    def kernel(x_hbm, o_ref, buf, sem):
        c = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK), :],
            buf,
            sem,
        )
        cp.start()
        cp.wait()
        o_ref[...] = buf[...] * 2.0

    x = jnp.arange(cap * 16, dtype=jnp.float32).reshape(cap, 16)
    out = pl.pallas_call(
        kernel,
        grid=(cap // CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((CHUNK, 16), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((cap, 16), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, 16), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    return "ok"


def probe2():
    """(8, 512) tile blocks from (T, 8, 512) HBM."""
    T = 16

    def kernel(x_hbm, o_ref, buf, sem):
        t = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[t], buf, sem)
        cp.start()
        cp.wait()
        o_ref[...] = (buf[...] + 1.0)[None]

    x = jnp.arange(T * 8 * 512, dtype=jnp.float32).reshape(T, 8, 512)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 8, 512), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 8, 512), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 512), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 1.0)
    return "ok"


def probe3():
    """Timing: per-chunk (16, CHUNK) -> (CHUNK, 16) in-kernel transpose."""
    import time

    nc = 4096

    def kernel(x_hbm, o_ref, buf, sem, do_t: bool):
        c = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)],
            buf,
            sem,
        )
        cp.start()
        cp.wait()
        if do_t:
            ft = buf[...].T  # (CHUNK, 16)
            acc = ft[:, 0:1] + ft[:, 5:6] * ft[:, 3:4]
            o_ref[...] = jnp.sum(acc) * jnp.ones((1, 128), jnp.float32)
        else:
            acc = buf[0:1, :] + buf[5:6, :] * buf[3:4, :]
            o_ref[...] = jnp.sum(acc) * jnp.ones((1, 128), jnp.float32)

    x = jnp.ones((16, nc * CHUNK), jnp.float32)
    outs = {}
    for do_t in (False, True):
        f = pl.pallas_call(
            functools.partial(kernel, do_t=do_t),
            grid=(nc,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda c: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((16, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        jf = jax.jit(f)
        jf(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            o = jf(x)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        outs[do_t] = dt
    return (
        f"no-transpose {outs[False]*1e3:.3f} ms, with {outs[True]*1e3:.3f} ms"
        f" -> transpose cost {(outs[True]-outs[False])/nc*1e9:.1f} ns/chunk"
    )


if __name__ == "__main__":
    for name, fn in [("probe1 (cap,16) slices", probe1),
                     ("probe2 (8,512) blocks", probe2),
                     ("probe3 transpose cost", probe3)]:
        try:
            print(name, "->", fn())
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:300]
            print(name, "-> FAIL:", msg)
