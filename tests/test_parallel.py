"""Multi-device tests on the virtual 8-device CPU mesh: tile-sharded render
equals single-device render; hybrid dp x tiles train step runs and matches
single-device gradients."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from c3dgs_tpu.config import OptimizationParams
from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.parallel import make_hybrid_train_step, make_mesh, render_tile_sharded
from c3dgs_tpu.render.types import RasterSettings
from c3dgs_tpu.train import trainer

SET = RasterSettings(
    width=64, height=32, tanfovx=math.tan(0.5), tanfovy=math.tan(0.5), sh_degree=0
)
EV = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
BG = jnp.asarray([0.1, 0.2, 0.3])


def toy_scene(n=80, cap=96, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    return gmod.from_point_cloud(pts, cols, capacity=cap, quantization=False)


def test_tile_sharded_render_matches_single():
    scene = toy_scene()
    mesh = make_mesh(dp=1, tiles=8)
    img_sharded, diag = render_tile_sharded(
        scene, EV, SET, BG, mesh, return_diag=True
    )
    img_sharded = np.asarray(img_sharded)
    img_single = np.asarray(trainer.render_scene(scene, EV, SET, BG)["render"])
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-5)
    # benign tile distribution: nothing may be dropped
    assert int(diag["shard_route_dropped"]) == 0


def test_tile_skew_trips_truncation_counter():
    """Adversarial tile skew: every gaussian lands in ONE tile, with an
    instance capacity tight enough that the owning device's chunk range
    exceeds the per-pair routing budget (2x headroom). The drop counter must
    be nonzero — silent corruption is not an accepted failure mode."""
    import dataclasses

    n, cap = 600, 640
    rng = np.random.default_rng(3)
    pts = (rng.normal(size=(n, 3)) * 0.02).astype(np.float32)
    # tight cluster projecting into the middle of tile (0,0) — NOT the
    # image center, which is the corner where all four tiles meet
    pts[:, 0] -= 0.82
    pts[:, 1] -= 0.82
    pts[:, 2] += 3.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    settings = dataclasses.replace(SET, instance_capacity=cap)
    mesh = make_mesh(dp=2, tiles=4)
    # sanity: the scene fits the global capacity (no global overflow) —
    # the truncation is purely a per-device skew phenomenon
    out = trainer.render_scene(scene, EV, settings, BG)
    assert int(out["overflow"]) == 0
    assert int(out["num_instances"]) > 2 * cap // 4  # exceeds local window
    _, diag = render_tile_sharded(
        scene, EV, settings, BG, mesh, return_diag=True
    )
    assert int(diag["shard_route_dropped"]) > 0


def test_morton_coherent_source_does_not_drop():
    """ADVICE r3: emission slots follow gaussian order, which is spatially
    coherent after a Morton sort — with CONTIGUOUS per-device slot blocks,
    each source slice concentrated into one destination device and
    chronically overflowed the per-(src,dst) budget. The interleaved slot
    slices sample the emission order uniformly, so a spread-out,
    spatially-SORTED scene at tight capacity must route with zero drops."""
    import dataclasses

    n, cap = 600, 1280
    rng = np.random.default_rng(5)
    pts = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    pts[:, 2] = 3.0 + pts[:, 2] * 0.05
    # spatial sort => gaussian order is tile-coherent (the adversarial
    # layout for contiguous slot blocks)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    settings = dataclasses.replace(SET, instance_capacity=cap)
    out = trainer.render_scene(scene, EV, settings, BG)
    assert int(out["overflow"]) == 0
    mesh = make_mesh(dp=2, tiles=4)
    img_sharded, diag = render_tile_sharded(
        scene, EV, settings, BG, mesh, return_diag=True
    )
    assert int(diag["shard_route_dropped"]) == 0
    img_single = np.asarray(trainer.render_scene(scene, EV, settings, BG)["render"])
    np.testing.assert_allclose(np.asarray(img_sharded), img_single, atol=1e-5)


def test_hybrid_train_step_runs_and_matches():
    scene = toy_scene()
    opt = OptimizationParams()
    mesh = make_mesh(dp=2, tiles=4)
    # the step donates its input state (which aliases `scene`'s buffers), so
    # snapshot originals and build a second state from a fresh scene
    orig_xyz = np.asarray(scene.xyz).copy()
    state = trainer.create_train_state(scene, opt, 1.0)
    scene2 = toy_scene()

    evs = jnp.stack([EV, EV + jnp.asarray([0, 0, 0, 0, 0.1, 0, 0])])
    gts = jnp.zeros((2, 3, 32, 64))
    step = make_hybrid_train_step(mesh, SET, opt, 1.0)
    new_state, metrics = step(state, evs, gts, BG)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["shard_route_dropped"]) == 0
    # parameters actually moved
    assert np.abs(np.asarray(new_state.scene.xyz) - orig_xyz).max() > 0

    # cross-check the gradient against a single-device 2-camera mean
    state2 = trainer.create_train_state(scene2, opt, 1.0)
    s0 = state2.scene.update_observers()
    params = trainer.scene_params(s0)

    def loss_fn(params):
        s = trainer.with_params(s0, params)
        total = 0.0
        for b in range(2):
            out = trainer.render_scene(s, evs[b], SET, BG)
            from c3dgs_tpu.ops import losses as L

            total = total + L.photometric_loss(out["render"], gts[b], opt.lambda_dssim)
        return total / 2

    g_single = jax.grad(loss_fn)(params)

    # re-derive sharded grads via one more step on fresh state with zero lr?
    # simpler: compare updated params direction using identical Adam states
    tx = trainer.make_optimizer(opt, 1.0)
    updates, _ = tx.update(g_single, state2.opt_state, params)
    expected = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    got = trainer.scene_params(new_state.scene)
    for k in expected:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(expected[k]), atol=5e-5, err_msg=k
        )


def test_mesh_shapes():
    m = make_mesh(dp=4, tiles=2)
    assert m.shape == {"dp": 4, "tiles": 2}
    m2 = make_mesh(tiles=8)
    assert m2.shape["dp"] == 1


def test_slab_loss_matches_full():
    """photometric_loss_rows (slab-sharded L1+SSIM with halo) must equal
    the full-image loss up to f32 partial-sum ordering, including at
    heights that don't divide the axis and tiny images where the halo
    clamps to the border."""
    import functools

    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.parallel.sharded import photometric_loss_rows

    rng = np.random.default_rng(9)
    for h, w in [(32, 64), (33, 40), (96, 48)]:
        pred = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
        gt = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
        mesh = make_mesh(dp=1, tiles=8)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(),) * 2,
            out_specs=jax.sharding.PartitionSpec(),
            check_vma=False,
        )
        def sharded(p, t):
            return photometric_loss_rows(p, t, 0.2, "tiles")[None]

        got = float(sharded(pred, gt)[0])
        want = float(L.photometric_loss(pred, gt, 0.2))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-7)


def test_routed_local_cap_geometry():
    """Static routing geometry invariants for assorted (cap, D, T): the
    local array always fits every pair budget + owned sentinels, is
    CHUNK-aligned, and budgets cover the balanced load with 2x headroom."""
    from c3dgs_tpu.render.binning import CHUNK, routed_local_cap

    for cap, d, t in [
        (1024, 8, 4), (1024, 4, 4), (1 << 21, 8, 4080), (640, 4, 4),
        (1 << 17, 2, 512), (1 << 19, 8, 2040), (128 * 6, 2, 3),
    ]:
        if cap % d:
            continue
        cap_pair, t_local, cap_local = routed_local_cap(cap, d, t)
        assert cap_local % CHUNK == 0
        assert cap_local >= d * cap_pair + t_local
        assert t_local * d >= t  # ownership covers the tile grid
        # 2x headroom over the balanced per-pair load
        dests = max(1, min(d, t))
        assert cap_pair * dests >= 2 * (cap // d)
