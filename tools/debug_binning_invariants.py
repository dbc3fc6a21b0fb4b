#!/usr/bin/env python
"""Validate packed-path binning invariants on TPU-computed bookkeeping."""
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.render import RasterSettings  # noqa: E402
from c3dgs_tpu.render import binning as B  # noqa: E402
from c3dgs_tpu.render.preprocess import preprocess  # noqa: E402
from tools.debug_gate_tpu import make_scene  # noqa: E402

CHUNK = B.CHUNK


def check(bn, prep_np, settings, n, cap, label):
    print(f"=== {label}")
    gid = np.asarray(bn.gid_sorted)
    j = np.asarray(bn.j_sorted)
    tid = np.asarray(bn.tid_sorted)
    tile_lo = np.asarray(bn.tile_lo)
    perm = np.asarray(bn.perm)
    off = np.asarray(bn.offset)
    ends = np.asarray(bn.ends)
    starts = np.asarray(bn.starts)
    T = settings.num_tiles
    nexec = int(bn.chunks_exec) * CHUNK

    # 1. sentinels: exactly one per tile, at segment end, in tile order
    ok = bool((ends[:-1] < ends[1:]).all()) if T > 1 else True
    print(f"  ends strictly increasing: {ok}")

    # 2. tid grouping vs tile_lo: lanes of chunk c must have
    #    tid in [tile_lo[c], tile_lo[c+1]] or be dead (tid == T)
    bad_chunks = []
    for c in range(nexec // CHUNK):
        lo, hi = tile_lo[c], tile_lo[c + 1]
        lane_tid = tid[c * CHUNK:(c + 1) * CHUNK]
        live = lane_tid < T
        if live.any():
            if lane_tid[live].min() < lo or lane_tid[live].max() > hi:
                bad_chunks.append((c, lo, hi, lane_tid[live].min(),
                                   lane_tid[live].max()))
    print(f"  tid within [tile_lo[c], tile_lo[c+1]]: "
          f"{'OK' if not bad_chunks else bad_chunks[:5]}")

    # 3. within each tile segment, lanes must be that tile's instances,
    #    and each tile's sentinel position == ends[t]
    seg_bad = 0
    for t in range(T):
        s, e = starts[t], ends[t]
        if (tid[s:e] != t).any():
            seg_bad += 1
    print(f"  segment tids pure: {'OK' if seg_bad == 0 else seg_bad}")

    # 4. presort slot consistency: slot_pre = off[gid] + j unique over
    #    real (kept) slots, and perm orders ALL emissions by it (round 5:
    #    culled emissions keep their payload, so perm[:total] is exactly
    #    emission order and the reducer segments at emit_cum)
    real = tid < T
    slot_pre = off[gid] + j
    sp = slot_pre[real]
    print(f"  presort slots unique among real: "
          f"{len(np.unique(sp)) == sp.size}")
    total = int(bn.num_instances)
    print(f"  total emissions={total} #kept(real)={int(real.sum())}")
    pos_slots = perm[:total]
    sp_perm = slot_pre[pos_slots]
    okp = bool((np.diff(sp_perm) > 0).all()) and int(sp_perm[0]) == 0 and (
        int(sp_perm[-1]) == total - 1
    )
    print(f"  perm[:total] == emission order (incl. culled): {okp}")

    # 5. emit_cum vs gid of perm-ordered slots: position p holds an
    #    emission of gaussian g iff emit_cum[g-1] <= p < emit_cum[g]
    ecum = np.asarray(bn.emit_cum)
    gid_pos = gid[pos_slots]
    bprev = np.concatenate([[0], ecum[:-1]])
    okb = True
    for p in range(0, total, max(1, total // 997)):
        g = gid_pos[p]
        if not (bprev[g] <= p < ecum[g]):
            okb = False
            print(f"    boundary mismatch at pos {p}: gid {g} "
                  f"range [{bprev[g]}, {ecum[g]})")
            break
    print(f"  emit_cum boundaries consistent: {okb}")


def main():
    settings = RasterSettings(width=256, height=192, tanfovx=math.tan(0.6),
                              tanfovy=math.tan(0.47), sh_degree=0,
                              fast_grad=False)
    means, cov, op, ev, colors = make_scene(2000, seed=1)
    n = means.shape[0]
    cap, _ = settings.resolve_caps(n)

    def binfn(m, c, o, col):
        prep = preprocess(m, c, o, ev, settings, None, col)
        return B.bin_gaussians(jax.lax.stop_gradient(prep), settings)

    bn_tpu = jax.device_get(jax.jit(binfn)(means, cov, op, colors))
    check(bn_tpu, None, settings, n, cap, "TPU binning")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bn_cpu = jax.device_get(jax.jit(binfn)(
            *(jax.device_put(a, cpu) for a in (means, cov, op, colors))))
    check(bn_cpu, None, settings, n, cap, "CPU binning")


if __name__ == "__main__":
    main()
