"""Multi-device rendering + training via shard_map.

New capability vs the single-GPU reference (SURVEY.md §2.4): the structural
"sequence parallelism" of this workload is pixel/tile-space sharding —
each device composites a slice of the 16x16-tile grid (Gaussians
replicated), and camera data-parallelism rides the second mesh axis:

  mesh ("dp", "tiles")
  - preprocess: per-dp-row camera, sharded N/D over "tiles" within the
    row (each device preprocesses its gaussian slice, the per-gaussian
    outputs all_gather; round 4 — was replicated through round 3);
  - binning: ROUTED — per-slot enumeration, culling, and all sorts run at
    ~cap/D per device; instances ride one all_to_all to their tile's
    owning device (binning.bin_gaussians_routed);
  - tile_blend: each device runs the Pallas kernels on its own sorted
    array of CHUNK-aligned owned-tile segments;
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
from ..render.binning import (
    bin_gaussians_routed,
    per_gaussian_table,
    routed_local_cap,
)
from ..render.preprocess import preprocess
from ..render.rasterizer import assemble_image, blend_gaussians_packed
from ..render.types import RasterSettings
from ..train import trainer


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _sharded_preprocess(
    means3d, cov3d, opacity, shs, ev, settings, axis_name: str
):
    """Preprocess N/D gaussians per device, all_gather the per-gaussian
    outputs (round 4, SCALING.md: preprocess was the last replicated O(N)
    stage, ~1 ms at 300k). Inputs are replicated, so slicing is free; the
    gather moves ~15 N-major f32 columns over ICI (~0.4 ms at 300k/D=8 —
    less than the (D-1)/D of preprocess compute it removes), and its VJP
    is the matching reduce-scatter. Pad rows (zeros) cull to radius 0 and
    are sliced off after the gather."""
    D = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    n = means3d.shape[0]
    k = _round_up(n, D) // D

    def sl(x):
        pad = [(0, k * D - n)] + [(0, 0)] * (x.ndim - 1)
        return jax.lax.dynamic_slice_in_dim(jnp.pad(x, pad), d * k, k, 0)

    prep_l = preprocess(
        sl(means3d), sl(cov3d), sl(opacity), ev, settings, shs=sl(shs)
    )
    return jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True)[:n],
        prep_l,
    )


_SSIM_HALO = 5  # 11x11 SAME window radius


def photometric_loss_rows(pred, target, lambda_dssim, axis_name: str):
    """Exact tile-sharded photometric loss on REPLICATED full images: each
    device sums its row-slab's L1 and SSIM-map contributions (slab + 5-row
    halo so every interior window matches the full-image SAME conv) and a
    psum over `axis_name` reassembles the full-image mean (round 4 — the
    full-image loss was previously computed identically on every device,
    ~1.5 ms of replicated SSIM convs; it also scaled every image cotangent
    by D, which the caller had to divide back out).

    Equal to L.photometric_loss up to f32 partial-sum ordering."""
    D = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    c, h, w = pred.shape
    rows = _round_up(h, D) // D
    span = min(rows + 2 * _SSIM_HALO, h)
    r0 = d * rows
    start = jnp.clip(r0 - _SSIM_HALO, 0, h - span)
    sl_p = jax.lax.dynamic_slice(pred, (0, start, 0), (c, span, w))
    sl_t = jax.lax.dynamic_slice(target, (0, start, 0), (c, span, w))
    grow = start + jnp.arange(span)  # global row of each slab row
    mask = ((grow >= r0) & (grow < jnp.minimum(r0 + rows, h)))[None, :, None]

    l1_sum = jnp.sum(jnp.abs(sl_p - sl_t) * mask)
    ssim_map = L.ssim(sl_p, sl_t, size_average=None)  # (1, C, span, W) map
    ssim_sum = jnp.sum(ssim_map[0] * mask)
    l1_sum, ssim_sum = jax.lax.psum((l1_sum, ssim_sum), axis_name)
    total = float(c * h * w)
    return (1.0 - lambda_dssim) * (l1_sum / total) + lambda_dssim * (
        1.0 - ssim_sum / total
    )


def _local_blend_tiles(prep, settings: RasterSettings, n_tiles_axis: int):
    """Per-device piece: routed binning (enumeration, cull, AND sorts all
    run at ~cap/D per device — instances are all_to_all'd to their tile's
    owner, see binning.bin_gaussians_routed), then stage + blend + (in the
    VJP) reduce ONLY this device's local sorted array; per-gaussian grad
    partials are psum'd by the caller. Returns the local
    (t_local, OUT_ROWS, PIX) block, the routed bookkeeping, and the local
    route_dropped counter (instances dropped by a routing-budget overflow
    — nonzero means a tile slice rendered without them; psum and alarm)."""
    rb = bin_gaussians_routed(
        jax.lax.stop_gradient(prep), settings, "tiles", n_tiles_axis
    )
    table = per_gaussian_table(prep, rb.offset)
    n = prep.mean2d.shape[0]
    cap, _ = settings.resolve_caps(n)
    t_total = settings.num_tiles
    _, t_local, cap_local = routed_local_cap(cap, n_tiles_axis, t_total)
    meta = jnp.stack(
        [rb.chunks_exec, rb.t0, rb.t1, jnp.int32(cap)]
    ).astype(jnp.int32)

    out_l = blend_gaussians_packed(
        settings.tiles_x,
        t_local,
        t_total,
        cap_local,
        cap,
        settings.fast_grad,
        table,
        (
            rb.gid_sorted,
            rb.tid_sorted,
            rb.sent_sorted,
            rb.j_sorted,
            rb.tile_lo,
            meta,
            None,
            rb.emit_cum,
        ),
    )
    return out_l, rb, rb.route_dropped


def _gathered_image(out_l, settings: RasterSettings, bg):
    """all_gather local tile blocks over "tiles" -> full image.

    Only rows 0..3 (color + final_T) cross devices — rows 4+ are the
    backward's lt_final/stop residuals, consumed inside the local VJP and
    never needed remotely; slicing before the gather halves its bytes."""
    out_full = jax.lax.all_gather(out_l[:, :4], "tiles", axis=0, tiled=True)
    out_full = out_full[: settings.num_tiles]
    image, _ = assemble_image(out_full, settings, None, bg)
    return image


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
    `return_diag`, also a dict with the psum'd `shard_route_dropped`
    counter (nonzero => instances were dropped by a routing-budget
    overflow under extreme tile skew and their tiles rendered without
    them — raise settings.instance_capacity)."""
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
        prep = _sharded_preprocess(
            means3d, cov3d, opacity, shs, ev, settings, "tiles"
        )
        out_l, _, trunc = _local_blend_tiles(prep, settings, n_tiles_axis)
        trunc = jax.lax.psum(trunc, ("dp", "tiles"))
        return _gathered_image(out_l, settings, bg), trunc

    img, trunc = run(
        scene.get_xyz(),
        scene.get_covariance(),
        (scene.get_opacity()[:, 0], scene.get_features(), extrinsic_vector),
    )
    if return_diag:
        return img, {"shard_route_dropped": trunc}
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
            # preprocess sharded N/D per device over "tiles" (round 4)
            prep = _sharded_preprocess(
                scene.get_xyz(),
                scene.get_covariance(),
                scene.get_opacity()[:, 0],
                scene.get_features(),
                ev,
                st,
                "tiles",
            )
            out_l, _, trunc = _local_blend_tiles(prep, st, n_tiles_axis)
            image = _gathered_image(out_l, st, bg)
            # slab-sharded loss (round 4): each device sums its row slab's
            # L1/SSIM contribution; the psum inside makes the loss
            # replicated within the dp row
            loss = photometric_loss_rows(
                image, gt, opt.lambda_dssim, "tiles"
            )
            return loss, jax.lax.stop_gradient(trunc)

        (loss, trunc), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params
        )
        trunc = jax.lax.psum(trunc, ("dp", "tiles"))
        # With the slab loss + sharded preprocess, each device's param grad
        # is a genuine PARTIAL (its preprocess slice + its tiles' blend
        # path; the all_gather VJPs are psum_scatters that already summed
        # the cross-device pieces of each partial) — the tiles-psum
        # reassembles the full per-camera gradient exactly once, dp-psum
        # sums cameras, so only the dp mean is divided out. (The former
        # replicated full-image loss scaled every image cotangent by
        # n_tiles, which had to be divided back out here.)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, ("dp", "tiles")) / n_dp,
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
        return new_state, {"loss": loss, "shard_route_dropped": trunc}

    return step
