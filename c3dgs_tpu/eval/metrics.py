"""Evaluation: render train/test splits, PSNR/SSIM(/LPIPS) + file size.

Parity: compress.py render_and_eval (:121-163, results.json with
PSNR/SSIM/LPIPS and size_bytes) and metrics.py evaluate (:38-117,
per_view.json). LPIPS requires pretrained VGG/Alex weights that cannot be
downloaded in a zero-egress environment; it is gated behind
`lpips_weights` (a local .npz of converted weights) and reported as null
when unavailable.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from . import lpips
from ..models.gaussians import GaussianScene
from ..ops import losses as L
from ..render.capacity import CapacityPolicy
from ..render.types import settings_from_intrinsic
from ..train import trainer

# settings is static (hashable dataclass); one compile per capacity bucket.
# Eval renders MUST be jitted: eager mode dispatches thousands of ops per
# frame through the tunneled backend — minutes per view, and any single
# dispatch hiccup kills the whole compress run (seen in practice as a
# spurious InvalidArgument mid-eval).
_render_jit = None


def _jit_render_scene(scene, extrinsic_vector, settings, bg):
    import jax

    global _render_jit
    if _render_jit is None:
        _render_jit = jax.jit(trainer.render_scene, static_argnums=(2,))
    return _render_jit(scene, extrinsic_vector, settings, bg)


_metrics_jit = None


def _jit_metrics(img, gt):
    """PSNR+SSIM under one jit (eager SSIM convs are hundreds of tunnel
    dispatches per view — same failure class as eager renders)."""
    import jax

    global _metrics_jit
    if _metrics_jit is None:
        _metrics_jit = jax.jit(
            lambda a, b: (L.psnr(a, b)[0, 0], L.ssim(a, b))
        )
    return _metrics_jit(img, gt)


def render_full(scene, extrinsic_vector, settings, bg, policy=None):
    """Render with overflow-free guarantee: if the frame's (gaussian, tile)
    instances exceed the capacity bucket, grow it and re-render. Silent
    overflow drops instances and quietly degrades eval images (measured
    20 dB of PSNR on an inflated post-finetune scene)."""
    policy = policy or CapacityPolicy()
    for _ in range(8):
        out = _jit_render_scene(
            scene, extrinsic_vector, policy.apply(settings), bg
        )
        if not policy.update(
            int(out["num_instances"]), int(out["overflow"])
        ):
            return out
    return out


def _to_png(path: str, img_chw: np.ndarray) -> None:
    from PIL import Image

    arr = (np.clip(img_chw, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def render_and_eval(
    scene: GaussianScene,
    cameras: List,
    bg: Optional[np.ndarray] = None,
    dump_dir: Optional[str] = None,
    npz_path: Optional[str] = None,
    lpips_fn=None,
) -> dict:
    """Per-view PSNR/SSIM (+LPIPS via lpips_fn if provided); means +
    compressed file size -> the reference's results.json schema."""
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    psnrs, ssims, lpipss, per_view = [], [], [], {}
    if dump_dir:
        os.makedirs(os.path.join(dump_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(dump_dir, "gt"), exist_ok=True)
    policy = CapacityPolicy()
    for i, cam in enumerate(cameras):
        settings = settings_from_intrinsic(cam.intrinsic, inference=True)
        out = render_full(
            scene, jnp.asarray(cam.extrinsic_vector), settings, bg, policy
        )
        img = out["render"]
        gt = jnp.asarray(cam.original_image)
        p, s = _jit_metrics(img, gt)
        p, s = float(p), float(s)
        psnrs.append(p)
        ssims.append(s)
        entry = {"psnr": p, "ssim": s}
        if lpips_fn is not None:
            lp = float(lpips_fn(img, gt))
            lpipss.append(lp)
            entry["lpips"] = lp
        else:
            entry["lpips"] = None
            entry["lpips_reason"] = lpips.UNAVAILABLE_REASON
        per_view[getattr(cam, "image_name", str(i))] = entry
        if dump_dir:
            name = getattr(cam, "image_name", f"{i:05d}") + ".png"
            _to_png(os.path.join(dump_dir, "renders", name), np.asarray(img))
            _to_png(os.path.join(dump_dir, "gt", name), np.asarray(gt))

    results = {
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "lpips": float(np.mean(lpipss)) if lpipss else None,
        "num_views": len(psnrs),
    }
    if lpips_fn is None:
        results["lpips_reason"] = lpips.UNAVAILABLE_REASON
    if npz_path and os.path.exists(npz_path):
        results["size_bytes"] = os.path.getsize(npz_path)
    results["per_view"] = per_view
    return results


def write_results(model_path: str, results: dict) -> None:
    per_view = results.pop("per_view", {})
    with open(os.path.join(model_path, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    with open(os.path.join(model_path, "per_view.json"), "w") as f:
        json.dump(per_view, f, indent=2)
