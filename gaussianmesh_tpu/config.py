"""Config / flag system.

Same parameter groups, names, shorthands and defaults as the reference
(/root/reference/arguments/__init__.py:47-114) — dataclass-reflected into
argparse (fields get `--name`; `short` fields also get the one-letter
form, mirroring the reference's leading-underscore convention). The
training run persists the merged config as JSON `cfg_args.json` in the
model dir and `load_combined_args` overlays CLI args on it, replacing the
reference's `eval()`-of-repr round-trip (a known quirk we don't keep).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field


def _short(name: str) -> str | None:
    # reference shorthands: leading-underscore attrs get first-letter flags
    return {"source_path": "s", "model_path": "m", "images": "i",
            "resolution": "r", "white_background": "w"}.get(name)


@dataclass
class ModelParams:
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = True
    eval: bool = False


@dataclass
class PipelineParams:
    # Retained for CLI parity; both paths are always on-device jnp here.
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class OptimizationParams:
    iterations: int = 30_000
    position_lr_init: float = 0.000_16
    position_lr_final: float = 0.000_001_6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 200
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = True
    alpha_mrloss: float = 6.0


@dataclass
class RuntimeParams:
    """TPU-framework additions (capacities, devices) — no reference analog."""
    capacity: int = 0            # 0 -> auto from init count
    max_per_tile: int = 1024
    blend_chunk: int = 128
    # rasterizer pair/row capacity headroom per gaussian (overflow is
    # counted + reported, and the trainer's blend grid walks every
    # capacity block, so oversizing costs real step time at large N)
    pair_capacity_per_gaussian: int = 10
    row_capacity_per_gaussian: int = 4
    use_pallas: bool = True
    data_axis: int = 1           # device-mesh data (camera) axis size
    tile_axis: int = 1           # device-mesh tile axis size
    shard_gaussians: int = 0     # >1: shard the Gaussian table + bands
                                 # over this many devices (gauss_shard)
    seed: int = 0


def add_group(parser: argparse.ArgumentParser, cls, prefix: str = "") -> None:
    g = parser.add_argument_group(cls.__name__)
    for f in dataclasses.fields(cls):
        names = [f"--{f.name}"]
        s = _short(f.name)
        if s:
            names.append(f"-{s}")
        if f.type in ("bool", bool):
            # BooleanOptionalAction adds --no_<flag>, so default-True
            # booleans (white_background, use_pallas, ...) are disablable
            g.add_argument(*names, action=argparse.BooleanOptionalAction,
                           default=None)
        else:
            typ = {int: int, float: float, str: str}.get(f.type) or (
                int if f.type == "int" else float if f.type == "float" else str)
            g.add_argument(*names, type=typ, default=None)


def extract(cls, args: argparse.Namespace):
    kw = {}
    for f in dataclasses.fields(cls):
        v = getattr(args, f.name, None)
        if v is not None:
            kw[f.name] = v
    return cls(**kw)


def save_cfg(model_path: str, groups: dict) -> None:
    os.makedirs(model_path, exist_ok=True)
    blob = {name: dataclasses.asdict(g) for name, g in groups.items()}
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(blob, f, indent=2)


def load_cfg(model_path: str) -> dict:
    path = os.path.join(model_path, "cfg_args.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


_GROUP_TYPES = {"model": ModelParams, "pipeline": PipelineParams,
                "optimization": OptimizationParams, "runtime": RuntimeParams}


def load_combined(model_path: str, args: argparse.Namespace) -> dict:
    """Training cfg overlaid with non-None CLI args (get_combined_args)."""
    saved = load_cfg(model_path)
    out = {}
    for name, cls in _GROUP_TYPES.items():
        base = cls(**saved.get(name, {}))
        for f in dataclasses.fields(cls):
            v = getattr(args, f.name, None)
            if v is not None:
                base = dataclasses.replace(base, **{f.name: v})
        out[name] = base
    return out
