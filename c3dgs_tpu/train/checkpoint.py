"""Full-training-state checkpointing (capture/restore parity).

Parity: GaussianModel.capture/restore (gaussian_model.py:176-210) +
torch.load/save checkpoint tuples (train.py:183-188, compress.py:214-216):
the complete TrainState — scene params & observers, Adam moments, densify
stats, PRNG key, step — round-trips through one .npz.

Implementation: path-flattened pytree -> np.savez_compressed. Static scene
config (degrees, flags) is stored as json in a side key so restore can
rebuild the exact pytree structure without a template.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OptimizationParams
from ..models.gaussians import GaussianScene, QuantState
from ..ops.quantize import ObserverState
from . import densify as D
from . import trainer


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
            for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, state: trainer.TrainState) -> None:
    scene = state.scene
    meta = {
        "max_sh_degree": scene.max_sh_degree,
        "active_sh_degree": scene.active_sh_degree,
        "quantization": scene.quantization,
        "use_factor_scaling": scene.use_factor_scaling,
        "has_scaling_factor": scene.scaling_factor is not None,
        "is_color_indexed": scene.is_color_indexed,
        "is_gaussian_indexed": scene.is_gaussian_indexed,
    }
    payload = _flatten(state._asdict())
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **payload)


def load_checkpoint(
    path: str, opt: OptimizationParams, spatial_lr_scale: float = 1.0
) -> trainer.TrainState:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())

    def get(key, default=None):
        return jnp.asarray(data[key]) if key in data else default

    quant = QuantState(
        *[
            ObserverState(
                get(f"scene/quant/{f}/min_val"),
                get(f"scene/quant/{f}/max_val"),
                get(f"scene/quant/{f}/initialized"),
            )
            for f in (
                "features_dc",
                "features_rest",
                "opacity",
                "scaling",
                "scaling_factor",
                "rotation",
            )
        ]
    )
    scene = GaussianScene(
        xyz=get("scene/xyz"),
        opacity=get("scene/opacity"),
        scaling_factor=get("scene/scaling_factor")
        if meta["has_scaling_factor"]
        else None,
        active=get("scene/active").astype(bool),
        features_dc=get("scene/features_dc"),
        features_rest=get("scene/features_rest"),
        scaling=get("scene/scaling"),
        rotation=get("scene/rotation"),
        feature_indices=get("scene/feature_indices")
        if meta["is_color_indexed"]
        else None,
        gaussian_indices=get("scene/gaussian_indices")
        if meta["is_gaussian_indexed"]
        else None,
        quant=quant,
        max_sh_degree=meta["max_sh_degree"],
        active_sh_degree=meta["active_sh_degree"],
        quantization=meta["quantization"],
        use_factor_scaling=meta["use_factor_scaling"],
    )

    # rebuild optimizer state skeleton, then fill moments
    state = trainer.create_train_state(scene, opt, spatial_lr_scale)
    adam_state, _ = state.opt_state
    params = trainer.scene_params(scene)
    mu = {k: get(f"opt_state/0/mu/{k}") for k in params}
    nu = {k: get(f"opt_state/0/nu/{k}") for k in params}
    count = get("opt_state/0/count")
    adam_state = adam_state._replace(count=count, mu=mu, nu=nu)
    opt_state = (adam_state, get("opt_state/1"))

    stats = D.DensifyStats(
        xyz_gradient_accum=get("stats/xyz_gradient_accum"),
        denom=get("stats/denom"),
        max_radii2d=get("stats/max_radii2d"),
    )
    return trainer.TrainState(
        scene=scene,
        opt_state=opt_state,
        stats=stats,
        key=get("key").astype(jnp.uint32),
        step=get("step"),
    )
