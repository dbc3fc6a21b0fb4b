"""Rasterizer tests: Pallas tile renderer vs pure-JAX oracle, forward and
backward (BASELINE.json config 1: toy scene, fwd+bwd allclose)."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3dgs_tpu.ops import quat
from c3dgs_tpu.render import RasterSettings
from c3dgs_tpu.render import oracle as oracle_mod
from c3dgs_tpu.render import rasterizer
from c3dgs_tpu.render.binning import bin_gaussians
from c3dgs_tpu.render.preprocess import preprocess


def make_scene(n=200, seed=0, sh=False):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.8
    means[:, 2] += 4.0  # in front of camera
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.5 - 2.5)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    cov3d = np.asarray(
        quat.cov6_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    opacity = (1 / (1 + np.exp(-rng.normal(size=n)))).astype(np.float32)
    colors = rng.random(size=(n, 3)).astype(np.float32)
    shs = None
    if sh:
        shs = rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.3
        colors = None
    # identity camera at origin
    ev = np.array([0, 0, 0, 1, 0, 0, 0], np.float32)
    return (
        jnp.asarray(means),
        jnp.asarray(cov3d),
        jnp.asarray(opacity),
        jnp.asarray(ev),
        None if colors is None else jnp.asarray(colors),
        None if shs is None else jnp.asarray(shs),
    )


SETTINGS = RasterSettings(
    width=64, height=48, tanfovx=math.tan(0.6), tanfovy=math.tan(0.45), sh_degree=3
)


def test_preprocess_culls_behind_camera():
    means, cov, op, ev, colors, _ = make_scene(50)
    means = means.at[:10, 2].set(-5.0)
    prep = preprocess(means, cov, op, ev, SETTINGS, colors_precomp=colors)
    assert not np.any(np.asarray(prep.radius[:10]) > 0)
    assert np.any(np.asarray(prep.radius[10:]) > 0)


def test_binning_consistency():
    means, cov, op, ev, colors, _ = make_scene(100)
    prep = preprocess(means, cov, op, ev, SETTINGS, colors_precomp=colors)
    b = bin_gaussians(prep, SETTINGS)
    assert int(b.overflow) == 0
    assert int(b.clipped) == 0
    # total emitted instances == sum of tiles_touched
    assert int(b.num_instances) == int(np.asarray(prep.tiles_touched).sum())
    starts, ends = np.asarray(b.starts), np.asarray(b.ends)
    nchunks = np.asarray(b.nchunks)
    # unpadded segments tile the sorted array, one sentinel row between them
    assert starts[0] == 0
    assert (starts[1:] == ends[:-1] + 1).all()
    assert (ends >= starts).all()
    # segments hold the kept instances; the ellipse-tile cull drops dead
    # bbox-corner instances (counted, never more than emitted)
    assert 0 <= int(b.culled) < int(b.num_instances)
    assert int((ends - starts).sum()) == int(b.num_instances) - int(b.culled)
    # gaussian-major perm orders EVERY emission (kept AND culled, round 5):
    # the first num_instances perm entries, gathered from the sorted
    # payload, must be ascending in (gid, j) == the emission slot
    total = int(b.num_instances)
    presort = np.asarray(b.offset)[np.asarray(b.gid_sorted)] + np.asarray(
        b.j_sorted
    )
    sp = presort[np.asarray(b.perm)[:total]]
    assert (np.diff(sp) > 0).all()
    assert sp[0] == 0 and sp[-1] == total - 1
    # one kernel iteration (shifted window) per CHUNK real instances
    ne = ends > starts
    assert (nchunks == -(-(ends - starts) // 128)).all()
    assert (nchunks[~ne] == 0).all()
    # grad layout: disjoint 128-aligned per-tile regions
    grad_base = np.asarray(b.grad_base)
    assert (grad_base % 128 == 0).all()
    assert (np.diff(grad_base) == nchunks[:-1] * 128).all()
    assert int(b.grad_total) == int(nchunks.sum()) * 128


@pytest.mark.parametrize("packed", [True, False])
@pytest.mark.parametrize("use_sh", [False, True])
def test_pallas_matches_oracle_forward(use_sh, packed):
    means, cov, op, ev, colors, shs = make_scene(300, sh=use_sh)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    settings = dataclasses.replace(SETTINGS, packed=packed)
    out_o = oracle_mod.render_oracle(
        means, cov, op, ev, settings, bg, shs=shs, colors_precomp=colors
    )
    out_p = rasterizer.render(
        means, cov, op, ev, settings, bg, shs=shs, colors_precomp=colors
    )
    img_o = np.asarray(out_o["render"])
    img_p = np.asarray(out_p["render"])
    assert img_p.shape == (3, 48, 64)
    np.testing.assert_allclose(img_p, img_o, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_p["final_T"]), np.asarray(out_o["final_T"]), atol=2e-5
    )


@pytest.mark.parametrize("packed", [True, False])
@pytest.mark.parametrize("fast_grad", [False, True])
def test_pallas_matches_oracle_gradients(fast_grad, packed):
    """Exact backward (fast_grad=False) must match the oracle tightly; the
    fast path's 1-pass suffix/colsum matmuls truncate inputs to bf16 — a
    relative per-term perturbation the back-to-front ordering keeps
    un-amplified (tiles.py). On CPU interpret mode dots are true f32, so
    both paths are near-exact here; the split documents the intended
    tolerance classes for TPU. Parametrized over BOTH kernel families
    (packed-chunk default + the round-1 per-tile kernels) so neither is
    ever uncovered (VERDICT r2 #8)."""
    means, cov, op, ev, colors, _ = make_scene(150)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    target = jnp.zeros((3, 48, 64))
    settings = dataclasses.replace(
        SETTINGS, fast_grad=fast_grad, packed=packed
    )

    def loss_oracle(m, c, o, e, col):
        img = oracle_mod.render_oracle(m, c, o, e, settings, bg, colors_precomp=col)[
            "render"
        ]
        return ((img - target) ** 2).sum()

    def loss_pallas(m, c, o, e, col):
        img = rasterizer.render(m, c, o, e, settings, bg, colors_precomp=col)["render"]
        return ((img - target) ** 2).sum()

    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(means, cov, op, ev, colors)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(means, cov, op, ev, colors)
    names = ["means", "cov", "opacity", "extrinsic", "colors"]
    atol = 5e-2 if fast_grad else 5e-4
    for name, a, b in zip(names, go, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b / scale, a / scale, atol=atol, err_msg=f"grad mismatch: {name}"
        )


def test_packed_freeze_chunk_compaction_exact():
    """Whole-chunk frozen skips (an opaque near wall saturates a tile, so
    later chunks of far splats are dead) are compacted out of the packed
    backward's grid in XLA (round 4). Neither the bench scene nor the
    other tests ever actually froze a chunk — this one does, and asserts
    forward AND gradients still match the oracle exactly, with the far
    occluded splats receiving ~zero gradient."""
    rng = np.random.default_rng(4)
    n_near, n_far = 60, 500
    # near wall: large opaque splats covering the left tile
    near = np.zeros((n_near, 3), np.float32)
    near[:, 0] = rng.uniform(-0.9, -0.3, n_near)
    near[:, 1] = rng.uniform(-0.5, 0.5, n_near)
    near[:, 2] = 2.0 + rng.uniform(0, 0.1, n_near)
    far = np.zeros((n_far, 3), np.float32)
    far[:, 0] = rng.uniform(-0.9, -0.3, n_far)
    far[:, 1] = rng.uniform(-0.5, 0.5, n_far)
    far[:, 2] = 6.0 + rng.uniform(0, 1.0, n_far)
    means = jnp.asarray(np.concatenate([near, far]))
    n = n_near + n_far
    scales = np.full((n, 3), 0.25, np.float32)
    scales[n_near:] = 0.12
    quats = np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1))
    cov3d = jnp.asarray(
        quat.cov6_from_scaling_rotation(
            jnp.asarray(scales), jnp.asarray(quats)
        )
    )
    opacity = np.full((n,), 0.995, np.float32)
    opacity[n_near:] = 0.6
    opacity = jnp.asarray(opacity)
    colors = jnp.asarray(rng.random(size=(n, 3)).astype(np.float32))
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    settings = dataclasses.replace(SETTINGS, fast_grad=False, packed=True)

    out = rasterizer.render(means, cov3d, opacity, ev, settings, bg,
                            colors_precomp=colors)
    oracle = oracle_mod.render_oracle(
        means, cov3d, opacity, ev, settings, bg, colors_precomp=colors
    )
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.asarray(oracle["render"]), atol=1e-4
    )
    # the wall must actually saturate (freeze preconditions)
    assert float(out["final_T"].min()) < 1e-6

    target = jnp.zeros((3, settings.height, settings.width))

    def loss(render_fn, m, c, o, col):
        img = render_fn(m, c, o, ev, settings, bg, colors_precomp=col)[
            "render"
        ]
        return ((img - target) ** 2).sum()

    go = jax.grad(lambda *a: loss(oracle_mod.render_oracle, *a),
                  argnums=(0, 1, 2, 3))(means, cov3d, opacity, colors)
    gp = jax.grad(lambda *a: loss(rasterizer.render, *a),
                  argnums=(0, 1, 2, 3))(means, cov3d, opacity, colors)
    for name, a, b in zip(["means", "cov", "op", "colors"], go, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg=f"grad mismatch: {name}"
        )
    # fully occluded far splats: ~zero gradient everywhere
    g_far = np.abs(np.asarray(gp[0][n_near:])).max()
    g_near = np.abs(np.asarray(gp[0][:n_near])).max()
    assert g_far < 1e-3 * max(g_near, 1e-6)


def test_packed_gradients_with_sentinel_at_chunk_boundary():
    """Regression: when a tile's segment ends exactly at a CHUNK boundary,
    its sentinel is lane 0 of the next chunk — the packed backward's
    walked-carry handoff must not read that dead lane (it silently zeroed
    the previous chunk's trailing-group transmittance walk; found by
    tools/verify_tpu.py on hardware, where the binning's float ordering
    produced such a layout while CPU runs never did)."""
    # seed/size chosen so CPU binning yields ends[t] % 128 == 0 for
    # mid-array tiles (74, 85 at 256x192 / 600 gaussians)
    rng = np.random.default_rng(35)
    n = 600
    means = rng.normal(size=(n, 3)).astype(np.float32) * 1.2
    means[:, 2] += 4.0
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.6 - 3.6)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    cov = jnp.asarray(
        quat.cov6_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    op = jnp.asarray(
        (1 / (1 + np.exp(-rng.normal(size=n) - 0.5))).astype(np.float32)
    )
    colors = jnp.asarray(rng.random(size=(n, 3)).astype(np.float32))
    means = jnp.asarray(means)
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    settings = RasterSettings(
        width=256, height=192, tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.47), sh_degree=0, fast_grad=False,
    )
    prep = preprocess(means, cov, op, ev, settings, colors_precomp=colors)
    ends = np.asarray(bin_gaussians(prep, settings).ends)
    hits = np.where((ends % 128 == 0) & (ends > 0))[0]
    assert hits.size > 0, "scene no longer triggers the boundary layout"

    bg = jnp.asarray([0.15, 0.1, 0.3])
    wimg = jax.random.normal(jax.random.PRNGKey(7), (3, 192, 256))

    def loss_oracle(m, c, o, col):
        img = oracle_mod.render_oracle(
            m, c, o, ev, settings, bg, colors_precomp=col
        )["render"]
        return jnp.vdot(wimg, img)

    def loss_pallas(m, c, o, col):
        img = rasterizer.render(
            m, c, o, ev, settings, bg, colors_precomp=col
        )["render"]
        return jnp.vdot(wimg, img)

    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(means, cov, op, colors)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(means, cov, op, colors)
    for name, a, b in zip(["means", "cov", "opacity", "colors"], go, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg=f"grad mismatch: {name}"
        )


def test_oracle_gradient_matches_finite_differences():
    means, cov, op, ev, colors, _ = make_scene(20)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    small = RasterSettings(
        width=32, height=32, tanfovx=math.tan(0.5), tanfovy=math.tan(0.5)
    )

    def loss(o):
        img = oracle_mod.render_oracle(means, cov, o, ev, small, bg, colors_precomp=colors)[
            "render"
        ]
        return (img**2).sum()

    g = np.asarray(jax.grad(loss)(op))
    eps = 1e-3
    for i in [0, 5, 13]:
        op_p = op.at[i].add(eps)
        op_m = op.at[i].add(-eps)
        fd = (float(loss(op_p)) - float(loss(op_m))) / (2 * eps)
        assert abs(fd - g[i]) < 2e-2 * max(abs(fd), 1.0), (i, fd, g[i])


def test_camera_gradients_flow():
    means, cov, op, ev, colors, _ = make_scene(100)
    bg = jnp.asarray([0.0, 0.0, 0.0])

    def loss(e):
        img = rasterizer.render(means, cov, op, e, SETTINGS, bg, colors_precomp=colors)[
            "render"
        ]
        return img.sum()

    g = np.asarray(jax.grad(loss)(ev))
    assert g.shape == (7,)
    assert np.abs(g).max() > 0


def test_viewspace_offset_grads():
    means, cov, op, ev, colors, _ = make_scene(100)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    vs = jnp.zeros((100, 2))

    def loss(v):
        img = rasterizer.render(
            means, cov, op, ev, SETTINGS, bg, colors_precomp=colors, viewspace_offset=v
        )["render"]
        return img.sum()

    g = np.asarray(jax.grad(loss)(vs))
    assert np.abs(g).max() > 0


def test_capacity_policy():
    from c3dgs_tpu.render.capacity import MIN_CAPACITY, CapacityPolicy

    pol = CapacityPolicy(initial=1 << 20, shrink_patience=3)
    assert pol.capacity == 1 << 20
    # overflow grows + requests re-render
    assert pol.update(num_instances=3_000_000, overflow=100) is True
    assert pol.capacity >= 3_000_000
    # sustained low usage shrinks after patience
    for _ in range(3):
        pol.update(num_instances=1000, overflow=0)
    assert pol.capacity < 4_194_304
    # never below the floor
    tiny = CapacityPolicy(initial=1)
    assert tiny.capacity == MIN_CAPACITY


def test_capacity_policy_grad_buffer():
    from c3dgs_tpu.render.capacity import MIN_CAPACITY, CapacityPolicy

    pol = CapacityPolicy(initial=1 << 20, shrink_patience=2)
    assert pol.grad_capacity == 0  # safe static bound until observed
    # first observation initializes the bucket (no re-render needed)
    assert pol.update(100_000, 0, grad_total=200_000, grad_overflow=0) is False
    assert pol.grad_capacity >= 200_000
    # grad overflow grows and requests a re-render (writes were clamped)
    assert pol.update(100_000, 0, grad_total=900_000, grad_overflow=50) is True
    assert pol.grad_capacity >= 900_000
    grown = pol.grad_capacity
    # sustained low grad usage shrinks after patience
    for _ in range(2):
        pol.update(100_000, 0, grad_total=130_000, grad_overflow=0)
    assert MIN_CAPACITY <= pol.grad_capacity < grown
    # explicit initial seeds the bucket
    seeded = CapacityPolicy(grad_initial=300_000)
    assert seeded.grad_capacity >= 300_000


def test_render_full_grows_capacity_until_overflow_free():
    from c3dgs_tpu.eval.metrics import render_full
    from c3dgs_tpu.render.capacity import CapacityPolicy

    means, cov, op, ev, colors, _ = make_scene(300)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    ref = rasterizer.render(means, cov, op, ev, SETTINGS, bg, colors_precomp=colors)
    need = int(ref["num_instances"])

    class SceneShim:
        active_sh_degree = 0

        def get_xyz(self):
            return means

        def get_covariance(self, m=1.0):
            return cov

        def get_opacity(self):
            return op[:, None]

        def get_features(self):
            return jnp.zeros((means.shape[0], 1, 3))

    # deliberately undersized starting bucket (policy floor is MIN_CAPACITY,
    # so go through the trainer path with precomputed colors instead)
    from c3dgs_tpu.render.types import RasterSettings as RS
    import dataclasses

    small = dataclasses.replace(SETTINGS, instance_capacity=0)
    pol = CapacityPolicy(initial=1)
    pol.capacity = 128  # force an undersized first bucket (bypass floor)
    from c3dgs_tpu.train import trainer as _tr

    calls = {"n": 0}

    def counting(scene, ev_, st, bg_, **kw):
        calls["n"] += 1
        return rasterizer.render(means, cov, op, ev_, st, bg_, colors_precomp=colors)

    # stub the module's jit boundary (render_full renders through a cached
    # jitted render_scene; the shim is not a pytree)
    from c3dgs_tpu.eval import metrics as _metrics

    orig_jit = _metrics._jit_render_scene
    _metrics._jit_render_scene = counting
    try:
        out = render_full(SceneShim(), ev, small, bg, pol)
    finally:
        _metrics._jit_render_scene = orig_jit
    assert calls["n"] >= 2  # at least one regrow happened
    assert int(out["overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.asarray(ref["render"]), atol=1e-5
    )


def test_blocked_indexed_colors_match_dense():
    """Codebook-indexed scene: the blocked (no dense (P,K,3) SH) color path
    must match the dense de-index path exactly (VERDICT r2 #4)."""
    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.ops import sh as sh_ops
    from c3dgs_tpu.train import trainer

    rng = np.random.default_rng(5)
    n, c = 150, 17
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    pts[:, 2] += 3.5
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    codebook = (rng.normal(size=(c, 16, 3)) * 0.3).astype(np.float32)
    idx = rng.integers(0, c, size=n).astype(np.int32)
    scene = scene.set_color_indexed(jnp.asarray(codebook), jnp.asarray(idx))
    scene = scene.replace(active_sh_degree=3)
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    st = dataclasses.replace(SETTINGS, sh_degree=3)
    img_dense = trainer.render_scene(scene, ev, st, bg, blocked_colors=False)
    img_block = trainer.render_scene(scene, ev, st, bg, blocked_colors=True)
    np.testing.assert_allclose(
        np.asarray(img_block["render"]), np.asarray(img_dense["render"]),
        atol=1e-6,
    )
    # the multi-block code path (p > block) as well
    dirs = np.asarray(rng.normal(size=(n, 3)), np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    blocked = sh_ops.sh_to_rgb_indexed_blocked(
        3, jnp.asarray(codebook), jnp.asarray(idx), jnp.asarray(dirs),
        block=64,
    )
    dense = sh_ops.sh_to_rgb(3, jnp.asarray(codebook[idx]), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense), atol=1e-6)


def test_packed_execution_capacity_exact_and_counted():
    """Packed mode: a probed grad bucket doubles as the execution capacity
    (stage/kernels/reduction run at exec_cap < cap). With enough room the
    image AND gradients are bit-comparable to the full-cap render; when the
    bucket is too tight the clamp is COUNTED in grad_overflow."""
    means, cov, op, ev, colors, _ = make_scene(250)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    full = dataclasses.replace(SETTINGS, instance_capacity=1 << 13)
    out_full = rasterizer.render(means, cov, op, ev, full, bg, colors_precomp=colors)
    need = int(out_full["grad_total"])  # chunks_exec * CHUNK
    tight = dataclasses.replace(full, grad_capacity=need + 128)

    def loss(settings):
        def f(m, c, o, col):
            return (
                rasterizer.render(m, c, o, ev, settings, bg, colors_precomp=col)[
                    "render"
                ]
                ** 2
            ).sum()

        return f

    out_t = rasterizer.render(means, cov, op, ev, tight, bg, colors_precomp=colors)
    assert int(out_t["grad_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(out_t["render"]), np.asarray(out_full["render"]), atol=1e-6
    )
    g_full = jax.grad(loss(full), argnums=(0, 1, 2, 3))(means, cov, op, colors)
    g_t = jax.grad(loss(tight), argnums=(0, 1, 2, 3))(means, cov, op, colors)
    for a, b in zip(g_full, g_t):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

    # too tight: clamped chunks are counted, never silent — and the
    # unflushed tiles degrade SOFTLY to background (their raw out blocks
    # are uninitialized HBM; unmasked, a single clamped training frame
    # feeds NaNs into the loss and poisons Adam permanently — seen at 1M
    # scale when the capacity policy was still growing its bucket)
    clamped = dataclasses.replace(full, grad_capacity=max(need - 512, 128))
    out_c = rasterizer.render(means, cov, op, ev, clamped, bg, colors_precomp=colors)
    assert int(out_c["grad_overflow"]) > 0
    img_c = np.asarray(out_c["render"])
    assert np.isfinite(img_c).all()
    # the LAST tile rows must be pure background (bg broadcast)
    assert np.allclose(img_c[:, -8:, -16:], np.asarray(bg)[:, None, None])

    def loss_c(m, c, o, col):
        return (
            rasterizer.render(m, c, o, ev, clamped, bg, colors_precomp=col)[
                "render"
            ]
            ** 2
        ).sum()

    g_c = jax.grad(loss_c, argnums=(0, 1, 2, 3))(means, cov, op, colors)
    for g in g_c:
        assert np.isfinite(np.asarray(g)).all()


def test_blocked_indexed_colors_gradients_match_dense():
    """Gradients through the blocked codebook-color path (lax.map VJP +
    per-block scatter-add into the codebook) must match the dense
    de-index path — QAT finetune at >= 2^20 splats rides it."""
    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.train import trainer

    rng = np.random.default_rng(9)
    n, c = 120, 13
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    pts[:, 2] += 3.5
    cols = rng.random(size=(n, 3)).astype(np.float32)
    base = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    codebook = (rng.normal(size=(c, 16, 3)) * 0.3).astype(np.float32)
    idx = rng.integers(0, c, size=n).astype(np.int32)
    scene = base.set_color_indexed(
        jnp.asarray(codebook), jnp.asarray(idx)
    ).replace(active_sh_degree=3)
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    st = dataclasses.replace(SETTINGS, sh_degree=3)

    def loss(fdc, frest, blocked):
        s = scene.replace(features_dc=fdc, features_rest=frest)
        out = trainer.render_scene(s, ev, st, bg, blocked_colors=blocked)
        return (out["render"] ** 2).sum()

    g_dense = jax.grad(loss, argnums=(0, 1))(
        scene.features_dc, scene.features_rest, False
    )
    g_block = jax.grad(loss, argnums=(0, 1))(
        scene.features_dc, scene.features_rest, True
    )
    for a, b in zip(g_dense, g_block):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(b).max() > 0  # gradients actually reach the codebook
        np.testing.assert_allclose(b, a, atol=1e-5)
