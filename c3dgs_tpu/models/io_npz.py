"""Compressed .npz container modeled on the reference's save_npz/load_npz
(scene/gaussian_model.py:505-740):

quantized layout — fp16 xyz; int8 `int_repr` + (scale, zero_point) for
features_dc/features_rest (raw), opacity (post-sigmoid), scaling
(post-normalize), scaling_factor (pre-exp log value), rotation
(post-normalize); feature_indices / gaussian_indices when indexed;
bool `quantization` flag; np.savez_compressed.

DOCUMENTED FORMAT DEVIATIONS (see PARITY.md):
1. Index arrays are written as uint16 whenever the codebook fits in 2^16
   rows (the default sizes always do) — the reference writes int32, and
   its loader runs torch.from_numpy(...).long()
   (gaussian_model.py:727-735), which only accepts uint16 numpy arrays
   from torch 2.3 on. Pass `int32_indices=True` (or set
   C3DGS_NPZ_INT32_INDICES=1) to emit the reference's int32 layout for
   cross-loading into older torch stacks; our own load_npz reads either.
2. Optional fixed-point uint16 xyz (`xyz_u16=True`, the compress CLI's
   default; `--xyz_fp16` restores the reference layout): per-axis
   min/step header, step = extent/65535 — more precise than fp16 at scene
   extents and smaller after DEFLATE. load_npz dispatches on the stored
   dtype.

Unquantized layout — plain float arrays under the same keys.
"""
from __future__ import annotations

import os

import jax.nn
import jax.numpy as jnp
import numpy as np

from ..ops import misc, quantize, quat
from . import gaussians as gmod


def _q(x: np.ndarray, obs: quantize.ObserverState):
    scale, zp = quantize.qparams(obs)
    q = np.clip(np.round(x / float(scale) + float(zp)), quantize.QMIN, quantize.QMAX)
    return q.astype(np.int8), np.asarray([float(scale)]), np.asarray([int(zp)])


def save_npz(
    scene: gmod.GaussianScene,
    path: str,
    compress: bool = True,
    half_precision: bool = False,
    sort_morton: bool = False,
    int32_indices: bool | None = None,
    xyz_u16: bool = False,
) -> gmod.GaussianScene:
    """Serialize. Returns the (possibly Morton-reordered) scene, mirroring
    the reference's in-place sort side effect (gaussian_model.py:513-514)."""
    scene = scene.compact()
    if sort_morton:
        scene = scene.morton_sorted()
    if isinstance(path, (str, os.PathLike)):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    dtype = np.float16 if half_precision else np.float32
    d: dict = {"quantization": scene.quantization}
    q = scene.quant

    if scene.quantization:
        if xyz_u16:
            # container extension: fixed-point uint16 xyz (per-axis
            # min/step header). Same 6 B/splat raw as fp16 but smaller
            # after DEFLATE (Morton-ordered fixed-point values have far
            # more byte-level coherence than fp16 bit patterns), and the
            # u16 step (extent/65535) sits below the fp16 half-ulp the
            # QAT accessor already rounds to — the accessor round-trips
            # bit-exactly away from zero. load_npz dispatches on dtype.
            xyz = np.asarray(scene.get_xyz()).astype(np.float32)
            mn = xyz.min(axis=0)
            step = np.maximum(xyz.max(axis=0) - mn, 1e-12) / 65535.0
            d["xyz"] = np.clip(
                np.round((xyz - mn) / step), 0, 65535
            ).astype(np.uint16)
            d["xyz_min"] = mn.astype(np.float32)
            d["xyz_step"] = step.astype(np.float32)
        else:
            d["xyz"] = np.asarray(scene.get_xyz()).astype(np.float16)
        d["features_dc"], d["features_dc_scale"], d["features_dc_zero_point"] = _q(
            np.asarray(scene.features_dc), q.features_dc
        )
        (
            d["features_rest"],
            d["features_rest_scale"],
            d["features_rest_zero_point"],
        ) = _q(np.asarray(scene.features_rest), q.features_rest)
        d["opacity"], d["opacity_scale"], d["opacity_zero_point"] = _q(
            np.asarray(jax.nn.sigmoid(scene.opacity)), q.opacity
        )
        scaling_act = np.asarray(quat.normalize(jax.nn.relu(scene.scaling)))
        d["scaling"], d["scaling_scale"], d["scaling_zero_point"] = _q(
            scaling_act, q.scaling
        )
        if scene.scaling_factor is not None:
            (
                d["scaling_factor"],
                d["scaling_factor_scale"],
                d["scaling_factor_zero_point"],
            ) = _q(np.asarray(scene.scaling_factor), q.scaling_factor)
        rot_act = np.asarray(quat.normalize(scene.rotation))
        d["rotation"], d["rotation_scale"], d["rotation_zero_point"] = _q(
            rot_act, q.rotation
        )
    else:
        d["xyz"] = np.asarray(scene.xyz)
        d["features_dc"] = np.asarray(scene.features_dc)
        d["features_rest"] = np.asarray(scene.features_rest)
        d["opacity"] = np.asarray(scene.opacity).astype(dtype)
        d["scaling"] = np.asarray(scene.scaling).astype(dtype)
        if scene.scaling_factor is not None:
            d["scaling_factor"] = np.asarray(scene.scaling_factor).astype(dtype)
        d["rotation"] = np.asarray(scene.rotation).astype(dtype)

    if int32_indices is None:
        int32_indices = bool(os.environ.get("C3DGS_NPZ_INT32_INDICES"))

    def _idx_dtype(rows: int):
        # smallest unsigned dtype that addresses the codebook: the index
        # arrays dominate the container at default codebook sizes (2 x
        # int32 was 8 B/splat against ~8 B for everything else combined;
        # uint16 halves them). Our load_npz astypes to int32 either way;
        # int32_indices restores the reference's exact layout for its
        # torch<2.3 loaders (module docstring + PARITY.md).
        if int32_indices:
            return np.int32
        return np.uint16 if rows <= (1 << 16) else np.int32

    if scene.is_color_indexed:
        d["feature_indices"] = np.asarray(scene.feature_indices).astype(
            _idx_dtype(scene.features_dc.shape[0])
        )
    if scene.is_gaussian_indexed:
        d["gaussian_indices"] = np.asarray(scene.gaussian_indices).astype(
            _idx_dtype(scene.scaling.shape[0])
        )

    (np.savez_compressed if compress else np.savez)(path, **d)
    return scene


def _deq(d, name):
    q = d[name].astype(np.float32)
    scale = float(d[f"{name}_scale"])
    zp = float(d[f"{name}_zero_point"])
    x = (q - zp) * scale
    return x, scale, zp


def _obs_from(x: np.ndarray) -> quantize.ObserverState:
    """Pin an observer to the dequantized tensor's range
    (gaussian_model.py:648-719)."""
    return quantize.set_range(float(x.min()), float(x.max()))


def load_npz(
    path: str,
    max_sh_degree: int = 3,
    use_factor_scaling: bool = True,
    override_quantization: bool = False,
    quantization: bool = True,
) -> gmod.GaussianScene:
    d = np.load(path)
    file_quant = bool(d["quantization"])
    if override_quantization:
        quantization = file_quant
    elif quantization != file_quant:
        print("WARNING: model is not quantisation aware but loaded model is")

    if d["xyz"].dtype == np.uint16:  # fixed-point container extension
        xyz = d["xyz"].astype(np.float32) * d["xyz_step"] + d["xyz_min"]
    else:
        xyz = d["xyz"].astype(np.float32)
    n = xyz.shape[0]
    qs = gmod.QuantState.create()

    if file_quant:
        f_rest, *_ = _deq(d, "features_rest")
        f_dc, *_ = _deq(d, "features_dc")
        opacity_act, *_ = _deq(d, "opacity")
        opacity = np.asarray(
            misc.inverse_sigmoid(np.clip(opacity_act, 1e-6, 1 - 1e-6))
        ).astype(np.float32)
        scaling, *_ = _deq(d, "scaling")
        rotation, *_ = _deq(d, "rotation")
        qs = gmod.QuantState(
            features_dc=_obs_from(f_dc),
            features_rest=_obs_from(f_rest),
            opacity=_obs_from(opacity_act),
            scaling=_obs_from(scaling),
            scaling_factor=quantize.init_observer(),
            rotation=_obs_from(rotation),
        )
        if "scaling_factor" in d:
            scaling_factor, *_ = _deq(d, "scaling_factor")
            qs = qs.replace(scaling_factor=_obs_from(scaling_factor))
        else:
            scaling_factor = None
    else:
        f_dc = d["features_dc"].astype(np.float32)
        f_rest = d["features_rest"].astype(np.float32)
        opacity = d["opacity"].astype(np.float32)
        scaling = d["scaling"].astype(np.float32)
        rotation = d["rotation"].astype(np.float32)
        scaling_factor = (
            d["scaling_factor"].astype(np.float32) if "scaling_factor" in d else None
        )

    feature_indices = (
        jnp.asarray(d["feature_indices"].astype(np.int32))
        if "feature_indices" in d
        else None
    )
    gaussian_indices = (
        jnp.asarray(d["gaussian_indices"].astype(np.int32))
        if "gaussian_indices" in d
        else None
    )

    if not use_factor_scaling and scaling_factor is not None:
        raise ValueError("file has scaling_factor but use_factor_scaling=False")

    return gmod.GaussianScene(
        xyz=jnp.asarray(xyz),
        opacity=jnp.asarray(opacity.reshape(n, 1)),
        scaling_factor=None
        if scaling_factor is None
        else jnp.asarray(scaling_factor.reshape(-1, 1)),
        active=jnp.ones(n, bool),
        features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        feature_indices=feature_indices,
        gaussian_indices=gaussian_indices,
        quant=qs,
        max_sh_degree=max_sh_degree,
        active_sh_degree=max_sh_degree,
        quantization=quantization,
        use_factor_scaling=scaling_factor is not None,
    )
