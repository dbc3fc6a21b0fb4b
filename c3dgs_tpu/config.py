"""Config / flag system: dataclass param groups + argparse + JSON round-trip.

Parity: arguments/__init__.py — ParamGroup reflection (:10-40: `_`-prefixed
attrs get shorthand flags, bools become store_true), ModelParams (:43),
PipelineParams (:76), CompressionParams (:85), OptimizationParams (:116),
and get_combined_args (:139). Flag names are kept identical for CLI
familiarity. The reference persists configs by `str(Namespace)` + `eval()`
(a code-injection hazard); here persistence is structured JSON
(`save_config`/`load_combined_args`), while `cfg_args` files written by the
reference are still *readable* via a restricted literal parser.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import get_type_hints


def setup_jax_cache(path: str = "/root/.jax_cache") -> None:
    """Enable the persistent XLA compile cache for every CLI entry point.

    Long-running runs (train -> compress -> render) share dozens of
    multi-second compiles; on the tunneled backend a remote-compile HTTP
    hiccup kills the process, and without this cache a retry repays the
    full compile bill. Call before the first jit.

    C3DGS_FORCE_CPU=1 pins the process (and thus every CLI a harness
    spawns) to the CPU backend: a plain JAX_PLATFORMS=cpu env var does
    NOT survive the environment's sitecustomize axon registration, and a
    subprocess that silently lands on the tunneled TPU backend serializes
    against whatever else holds the chip (pytest smokes hung exactly
    this way)."""
    import os as _os

    import jax

    if _os.environ.get("C3DGS_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: cache is an optimization only


@dataclasses.dataclass(frozen=True)
class ParamGroup:
    """Shared argparse bridge. Fields named with a leading underscore in the
    reference get shorthand flags; here declared via `shorthands()`."""

    @classmethod
    def add_to_parser(cls, parser: argparse.ArgumentParser, name: str, fill_none=False):
        group = parser.add_argument_group(name)
        hints = get_type_hints(cls)
        for f in dataclasses.fields(cls):
            if f.name.startswith("_"):
                continue
            t = hints.get(f.name, str)
            default = None if fill_none else f.default
            short = cls.shorthands().get(f.name)
            names = [f"--{f.name}"] + ([f"-{short}"] if short else [])
            if t is bool:
                group.add_argument(*names, action="store_true", default=default)
            else:
                group.add_argument(*names, type=t, default=default)

    @classmethod
    def shorthands(cls) -> dict:
        return {}

    @classmethod
    def extract(cls, args) -> "ParamGroup":
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name.startswith("_"):
                continue
            v = getattr(args, f.name, None)
            if v is not None:
                kwargs[f.name] = v
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if not f.name.startswith("_")
        }


@dataclasses.dataclass(frozen=True)
class ModelParams(ParamGroup):
    """arguments/__init__.py:43-74."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = False

    @classmethod
    def shorthands(cls):
        return {"source_path": "s", "model_path": "m", "images": "i", "resolution": "r", "white_background": "w"}

    def post_extract(self):
        return dataclasses.replace(
            self,
            source_path=os.path.abspath(self.source_path) if self.source_path else "",
        )


@dataclasses.dataclass(frozen=True)
class PipelineParams(ParamGroup):
    """arguments/__init__.py:76-83."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class CompressionParams(ParamGroup):
    """arguments/__init__.py:85-114 (defaults preserved exactly)."""

    load_iteration: int = -1
    start_checkpoint: str = ""
    output_vq: str = ""

    # importance_include / importance_prune / color_importance_prune are
    # accepted for CLI parity but VESTIGIAL, exactly as in the reference:
    # declared (arguments/__init__.py:88-92) yet never read by the pipeline
    # (compression/vq.py:109 declares importance_prune and never uses it;
    # pruning is controlled by prune_threshold, keep thresholds by the
    # *_keep_quantile autoset).
    importance_include: float = 0.0
    importance_prune: float = 1.0

    color_codebook_size: int = 2**12
    color_cluster_iterations: int = 100
    color_decay: float = 0.8
    color_batch_size: int = 2**18
    color_compress_non_dir: bool = True  # arguments/__init__.py:97
    color_importance_include: float = 0.6 * 1e-6
    color_importance_prune: float = 0.0

    gaussian_codebook_size: int = 2**12
    gaussian_cluster_iterations: int = 800
    gaussian_decay: float = 0.8
    gaussian_batch_size: int = 2**20
    gaussian_importance_include: float = 0.3 * 1e-5

    not_compress_color: bool = False
    not_compress_gaussians: bool = False
    not_sort_morton: bool = False
    not_prune: bool = False
    prune_threshold: float = 0.0

    finetune_iterations: int = 5000

    # keep-quantile knobs (extension): the reference autosets its keep
    # thresholds at the 0.9 (color) / 0.75 (covariance) sensitivity
    # quantiles (compress.py:212-219); raising them stores fewer
    # uncompressed high-sensitivity rows — the QAT finetune absorbs most
    # of the quality cost, and the kept-dense color rows are a large
    # fraction of the container at small scene scales
    color_keep_quantile: float = 0.9
    gaussian_keep_quantile: float = 0.75

    # container extension (not in the reference): fixed-point uint16 xyz
    # instead of fp16 — same raw bytes, but Morton-ordered fixed-point
    # values DEFLATE far better than fp16 bit patterns, and the u16 step
    # (extent/65535) sits below the fp16 grid the QAT accessor already
    # rounds to, so quality is unchanged. xyz_fp16 restores the
    # reference's exact fp16 layout (models/io_npz.py, PARITY.md).
    xyz_fp16: bool = False


@dataclasses.dataclass(frozen=True)
class OptimizationParams(ParamGroup):
    """arguments/__init__.py:116-137 (defaults preserved exactly)."""

    iterations: int = 30_000
    epochs: int = 100
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    not_quantization_aware: bool = False


def save_config(model_path: str, groups: dict) -> None:
    """Write cfg_args.json (structured replacement for the reference's
    eval()-able cfg_args, arguments/__init__.py:152-159 counterpart)."""
    os.makedirs(model_path, exist_ok=True)
    payload = {k: g.to_dict() for k, g in groups.items()}
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(payload, f, indent=2)
    # also write a reference-style cfg_args Namespace repr for interop
    flat = {}
    for g in groups.values():
        flat.update(g.to_dict())
    ns = argparse.Namespace(**flat)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(ns))


def _parse_namespace_repr(text: str) -> dict:
    """Parse `Namespace(a=1, b='x')` without eval (restricted literals)."""
    import ast

    text = text.strip()
    assert text.startswith("Namespace(") and text.endswith(")")
    body = text[len("Namespace(") : -1]
    node = ast.parse(f"dict({body})", mode="eval")
    return {
        kw.arg: ast.literal_eval(kw.value) for kw in node.body.keywords  # type: ignore
    }


def load_combined_args(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """get_combined_args (arguments/__init__.py:139-159): merge the model
    dir's saved config under CLI overrides."""
    cmdline = parser.parse_args(argv if argv is not None else sys.argv[1:])
    merged = {}
    model_path = getattr(cmdline, "model_path", "")
    if model_path:
        json_path = os.path.join(model_path, "cfg_args.json")
        txt_path = os.path.join(model_path, "cfg_args")
        if os.path.exists(json_path):
            with open(json_path) as f:
                for group in json.load(f).values():
                    merged.update(group)
            print(f"Config loaded: {json_path}")
        elif os.path.exists(txt_path):
            with open(txt_path) as f:
                merged.update(_parse_namespace_repr(f.read()))
            print(f"Config loaded: {txt_path}")
    for k, v in vars(cmdline).items():
        if v is not None:
            merged[k] = v
    return argparse.Namespace(**merged)
