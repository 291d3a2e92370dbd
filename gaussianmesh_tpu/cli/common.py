"""Shared CLI plumbing."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from gaussianmesh_tpu import config as cfg_mod


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    for cls in (cfg_mod.ModelParams, cfg_mod.PipelineParams,
                cfg_mod.OptimizationParams, cfg_mod.RuntimeParams):
        cfg_mod.add_group(p, cls)
    return p


def setup_cache() -> None:
    cache = os.environ.get("GM_TPU_COMPILE_CACHE", "/tmp/gm_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # GM_PLATFORM=cpu forces the CLI onto a specific backend even where a
    # site hook pre-registers an accelerator plugin (env JAX_PLATFORMS can
    # be too late there)
    plat = os.environ.get("GM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


def save_image(path: str, color) -> None:
    """(3, H, W) float -> PNG (render.py:29 used cv2 BGR; we write RGB)."""
    import imageio.v2 as imageio
    arr = np.asarray(color)
    img = (np.clip(arr, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, img)
