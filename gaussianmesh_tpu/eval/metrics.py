"""Offline evaluation over rendered/gt image directories — metrics.py parity.

Reference (/root/reference/metrics.py:41-107): for each
<model>/test/ours_<iter>/{renders,gt} pair, compute SSIM/PSNR/LPIPS per
view, write results.json + per_view.json into the model dir.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from gaussianmesh_tpu.eval.lpips import LPIPS
from gaussianmesh_tpu.train.loss import psnr as psnr_fn, ssim as ssim_fn


def _read_image(path: str) -> jnp.ndarray:
    arr = np.asarray(Image.open(path).convert("RGB")).astype(np.float32) / 255.0
    return jnp.asarray(arr.transpose(2, 0, 1))


def evaluate_dirs(renders_dir: str, gt_dir: str,
                  lpips_weights: str | None = None) -> dict:
    names = sorted(os.listdir(renders_dir))
    lpips = LPIPS(lpips_weights)
    if not lpips.available:
        print("[metrics] WARNING: LPIPS weights not found — reporting "
              "PSNR/SSIM only. Supply lpips_vgg16.npz (see "
              "gaussianmesh_tpu/eval/lpips.py) or pass --lpips_weights.")
    per_view: dict[str, dict] = {}
    ssims, psnrs, lpipss = [], [], []
    for name in names:
        render = _read_image(os.path.join(renders_dir, name))
        gt = _read_image(os.path.join(gt_dir, name))
        s = float(ssim_fn(render, gt))
        p = float(psnr_fn(render, gt))
        entry = {"SSIM": s, "PSNR": p}
        ssims.append(s)
        psnrs.append(p)
        if lpips.available:
            l = lpips(render, gt)
            entry["LPIPS"] = l
            lpipss.append(l)
        per_view[name] = entry
    out = {"SSIM": float(np.mean(ssims)) if ssims else None,
           "PSNR": float(np.mean(psnrs)) if psnrs else None,
           # explicit None (not absent) when weights are missing, so the
           # degradation is visible in results.json, not silent
           "LPIPS": float(np.mean(lpipss)) if lpipss else None}
    return {"mean": out, "per_view": per_view}


def evaluate_model_paths(model_paths: list[str],
                         lpips_weights: str | None = None) -> None:
    """metrics.py CLI behavior: scan <model>/test/ours_*/ and write
    results.json + per_view.json."""
    for model_path in model_paths:
        results = {}
        per_view_all = {}
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print(f"[metrics] no test dir in {model_path}")
            continue
        for method in sorted(os.listdir(test_dir)):
            mdir = os.path.join(test_dir, method)
            renders = os.path.join(mdir, "renders")
            gt = os.path.join(mdir, "gt")
            if not (os.path.isdir(renders) and os.path.isdir(gt)):
                continue
            res = evaluate_dirs(renders, gt, lpips_weights)
            results[method] = res["mean"]
            per_view_all[method] = res["per_view"]
            print(f"  {method}: " + "  ".join(
                f"{k} {v:.7f}" for k, v in res["mean"].items() if v is not None))
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view_all, f, indent=2)
