"""Multi-device rendering + training via shard_map.

New capability vs the single-GPU reference (SURVEY.md §2.4): the structural
"sequence parallelism" of this workload is pixel/tile-space sharding —
each device composites a slice of the 16x16-tile grid (Gaussians
replicated), and camera data-parallelism rides the second mesh axis:

  mesh ("dp", "tiles")
  - preprocess/binning: per-dp-row camera, replicated within the row
    (O(N) jnp work, cheap next to blending);
  - tile_blend: each device runs the Pallas kernel on its contiguous slice
    of CHUNK-aligned tile segments;
  - image: all_gather over "tiles" (a few MB over ICI);
  - gradients: each device backprops its tile slice; psum over
    ("tiles","dp") reconstructs exact full gradients (XLA overlaps these
    collectives with the backward as usual).

Gradients are exact and deterministic: the per-tile instance grads reduce by
segment-sum (see render/tiles.py), and cross-device reduction is a psum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OptimizationParams
from ..models.gaussians import GaussianScene
from ..ops import losses as L
from ..render.binning import CHUNK, bin_gaussians, per_gaussian_table
from ..render.preprocess import preprocess
from ..render.rasterizer import assemble_image, blend_gaussians_packed
from ..render.types import RasterSettings
from ..train import trainer

# static per-device slot-capacity headroom over the even cap/D split:
# tile loads skew, so a device's owned chunk range can exceed cap/D.
# Overshoot is truncated (trailing owned tiles dropped) — COUNTED in the
# `shard_truncated_chunks` diagnostic every sharded entry point returns
# (psum'd over the mesh), so corruption on a slice is impossible without
# a nonzero counter. Raise settings.instance_capacity (or the factor) if
# a scene's tile skew exceeds 2x.
LOCAL_CAP_FACTOR = 2


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _local_blend_tiles(prep, settings: RasterSettings, n_tiles_axis: int):
    """Per-device piece: bin (enumeration/cull/key-build sharded over
    "tiles", sorts replicated after an all_gather of the packed key/payload
    arrays — see SCALING.md), then stage + blend + (in the VJP) reduce ONLY
    this device's chunk slice of the sorted instance array. All row-level
    O(cap) work — the enumeration, the stage gather, both Pallas kernels,
    and the gradient reduction — runs at ~cap/D per device; per-gaussian
    grad partials are psum'd by the caller. Returns the local
    (t_local, OUT_ROWS, PIX) block."""
    binning = bin_gaussians(
        jax.lax.stop_gradient(prep),
        settings,
        shard_axis="tiles",
        shard_num=n_tiles_axis,
    )
    table = per_gaussian_table(prep, binning.offset)
    n = prep.mean2d.shape[0]
    cap, _ = settings.resolve_caps(n)
    t_total = settings.num_tiles
    t_pad = _round_up(t_total, n_tiles_axis)
    t_local = t_pad // n_tiles_axis
    cap_local = min(
        _round_up(LOCAL_CAP_FACTOR * cap // n_tiles_axis, CHUNK),
        _round_up(cap, CHUNK),
    )
    nc_local = cap_local // CHUNK

    d = jax.lax.axis_index("tiles")
    t0 = jnp.minimum(d * t_local, t_total)
    t1 = jnp.minimum(t0 + t_local, t_total)
    has = t1 > t0
    # owned chunk range: the chunks containing slots
    # [starts[t0], ends[t1 - 1]] (every owned tile's full segment +
    # sentinel lies inside — segments are contiguous and tile-ordered)
    c_lo = jnp.where(
        has, binning.starts[jnp.minimum(t0, t_total - 1)] // CHUNK, 0
    )
    c_hi = jnp.where(
        has, binning.ends[jnp.maximum(t1 - 1, 0)] // CHUNK + 1, 0
    )
    nc_exec = jnp.clip(c_hi - c_lo, 0, nc_local)
    # chunks of owned tiles beyond the local capacity window: these tiles
    # simply never execute (their out blocks stay at the kernel's init
    # state). Returned as a diagnostic so callers can alarm instead of
    # shipping silently-corrupt slices.
    truncated_chunks = jnp.maximum(c_hi - c_lo - nc_local, 0)

    slot0 = c_lo * CHUNK

    def slot_slice(a, fill):
        ap = jnp.concatenate(
            [a, jnp.full((cap_local,), fill, a.dtype)]
        )
        return jax.lax.dynamic_slice(ap, (slot0,), (cap_local,))

    gid_l = slot_slice(binning.gid_sorted, jnp.int32(n - 1))
    tid_l = slot_slice(binning.tid_sorted, jnp.int32(t_total))
    sent_l = slot_slice(binning.sent_sorted, True)
    j_l = slot_slice(binning.j_sorted, jnp.int32(0))
    tl_pad = jnp.concatenate(
        [
            binning.tile_lo,
            jnp.full((nc_local + 1,), t_total, jnp.int32),
        ]
    )
    tile_lo_l = jax.lax.dynamic_slice(tl_pad, (c_lo,), (nc_local + 1,))
    meta = jnp.stack(
        [nc_exec, t0, t1, jnp.int32(cap)]
    ).astype(jnp.int32)

    out_l = blend_gaussians_packed(
        settings.tiles_x,
        t_local,
        t_total,
        cap_local,
        cap,
        settings.fast_grad,
        table,
        (gid_l, tid_l, sent_l, j_l, tile_lo_l, meta, None, binning.emit_cum),
    )
    return out_l, binning, truncated_chunks


def _gathered_image(out_l, settings: RasterSettings, bg):
    """all_gather local tile blocks over "tiles" -> full image.

    Only rows 0..3 (color + final_T) cross devices — rows 4+ are the
    backward's lt_final/stop residuals, consumed inside the local VJP and
    never needed remotely; slicing before the gather halves its bytes."""
    out_full = jax.lax.all_gather(out_l[:, :4], "tiles", axis=0, tiled=True)
    out_full = out_full[: settings.num_tiles]
    color, final_t = assemble_image(out_full, settings)
    return color + final_t[None] * bg[:, None, None]


def render_tile_sharded(
    scene: GaussianScene,
    extrinsic_vector: jax.Array,
    settings: RasterSettings,
    bg: jax.Array,
    mesh: Mesh,
    return_diag: bool = False,
) -> jax.Array:
    """Inference render with the tile grid sharded over mesh axis "tiles"
    (replicated over "dp"). Returns the full image (replicated); with
    `return_diag`, also a dict with the psum'd `shard_truncated_chunks`
    counter (nonzero => some device's owned tile range exceeded its
    LOCAL_CAP_FACTOR window and trailing tiles were dropped)."""
    n_tiles_axis = mesh.shape["tiles"]
    settings = trainer.settings_with_degree(settings, scene.active_sh_degree)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(means3d, cov3d, opacity_shs_ev):
        opacity, shs, ev = opacity_shs_ev
        prep = preprocess(means3d, cov3d, opacity, ev, settings, shs=shs)
        out_l, _, trunc = _local_blend_tiles(prep, settings, n_tiles_axis)
        trunc = jax.lax.psum(trunc, ("dp", "tiles"))
        return _gathered_image(out_l, settings, bg), trunc

    img, trunc = run(
        scene.get_xyz(),
        scene.get_covariance(),
        (scene.get_opacity()[:, 0], scene.get_features(), extrinsic_vector),
    )
    if return_diag:
        return img, {"shard_truncated_chunks": trunc}
    return img


def make_hybrid_train_step(
    mesh: Mesh,
    settings: RasterSettings,
    opt: OptimizationParams = OptimizationParams(),
    spatial_lr_scale: float = 1.0,
):
    """Build a jitted dp x tile-sharded train step.

    Takes (state, extrinsics (B,7), gts (B,3,H,W), bg (3,)) with
    B == mesh.shape['dp']; each dp row trains its own camera, gradients are
    psum'd over the whole mesh and the (replicated) Adam update applied.
    """
    n_dp = mesh.shape["dp"]
    n_tiles_axis = mesh.shape["tiles"]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def loss_and_grads(scene0_params, evs_b, gts_b, bg):
        params, scene_rest = scene0_params
        ev = evs_b[0]
        gt = gts_b[0]

        def local_loss(params):
            scene = trainer.with_params(scene_rest, params)
            st = trainer.settings_with_degree(settings, scene.active_sh_degree)
            prep = preprocess(
                scene.get_xyz(),
                scene.get_covariance(),
                scene.get_opacity()[:, 0],
                ev,
                st,
                shs=scene.get_features(),
            )
            out_l, _, trunc = _local_blend_tiles(prep, st, n_tiles_axis)
            image = _gathered_image(out_l, st, bg)
            loss = L.photometric_loss(image, gt, opt.lambda_dssim)
            return loss, jax.lax.stop_gradient(trunc)

        (loss, trunc), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params
        )
        trunc = jax.lax.psum(trunc, ("dp", "tiles"))
        # every device in a dp row computes the (identical) full-image loss,
        # and the transpose of the "tiles" all_gather is a reduce-scatter of
        # those identical cotangents — so each grad_d arrives scaled by
        # n_tiles. tiles-psum reassembles per-camera grads (x n_tiles),
        # dp-psum sums cameras; divide by both for the exact camera mean
        # (n_tiles, n_dp powers of two -> the division is exact in f32)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, ("dp", "tiles")) / (n_dp * n_tiles_axis),
            grads,
        )
        loss = jax.lax.psum(loss, "dp") / n_dp
        return loss, grads, trunc

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: trainer.TrainState, evs, gts, bg):
        scene0 = state.scene.update_observers()
        params = trainer.scene_params(scene0)
        loss, grads, trunc = loss_and_grads((params, scene0), evs, gts, bg)
        tx = trainer.make_optimizer(opt, spatial_lr_scale)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        new_state = state._replace(
            scene=trainer.with_params(scene0, params),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "shard_truncated_chunks": trunc}

    return step
