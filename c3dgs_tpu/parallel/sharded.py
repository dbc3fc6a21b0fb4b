"""Multi-device rendering + training via shard_map.

New capability vs the single-GPU reference (SURVEY.md §2.4): the structural
"sequence parallelism" of this workload is pixel/tile-space sharding —
each device composites a slice of the 16x16-tile grid (Gaussians
replicated), and camera data-parallelism rides the second mesh axis:

  mesh ("dp", "tiles")
  - preprocess: per-dp-row camera, replicated within the row (O(N) jnp
    work, cheap next to blending);
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
        return new_state, {"loss": loss, "shard_route_dropped": trunc}

    return step
