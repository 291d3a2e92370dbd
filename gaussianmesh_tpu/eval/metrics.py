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
                  lpips_weights: str | None = None,
                  lpips_uncalibrated: bool = False) -> dict:
    names = sorted(os.listdir(renders_dir))
    lpips = LPIPS(lpips_weights, uncalibrated=lpips_uncalibrated)
    lpips_key = "LPIPS" if lpips.calibrated else "LPIPS_uncalibrated"
    if not lpips.calibrated:
        print("[metrics] WARNING: no pretrained LPIPS weights — "
              + ("reporting LPIPS_uncalibrated (seed-weight graph; "
                 "NOT comparable to published LPIPS)."
                 if lpips.available else
                 "reporting PSNR/SSIM only. Supply lpips_vgg16.npz (see "
                 "gaussianmesh_tpu/eval/lpips.py), pass --lpips_weights, "
                 "or opt into --lpips_uncalibrated."))
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
            entry[lpips_key] = l
            lpipss.append(l)
        per_view[name] = entry
    out = {"SSIM": float(np.mean(ssims)) if ssims else None,
           "PSNR": float(np.mean(psnrs)) if psnrs else None,
           # explicit None (not absent) when weights are missing, so the
           # degradation is visible in results.json, not silent — with
           # the reason spelled out next to it
           "LPIPS": float(np.mean(lpipss)) if (lpipss and lpips.calibrated)
           else None}
    if not lpips.calibrated:
        if lpips.available and lpipss:
            out["LPIPS_uncalibrated"] = float(np.mean(lpipss))
        out["LPIPS_note"] = (
            "pretrained VGG16 weights unavailable in this environment "
            "(zero egress); the LPIPS graph itself is certified against "
            "a torch oracle in tests/test_lpips.py")
    return {"mean": out, "per_view": per_view}


def evaluate_model_paths(model_paths: list[str],
                         lpips_weights: str | None = None,
                         lpips_uncalibrated: bool = False) -> None:
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
            res = evaluate_dirs(renders, gt, lpips_weights,
                                lpips_uncalibrated)
            results[method] = res["mean"]
            per_view_all[method] = res["per_view"]
            print(f"  {method}: " + "  ".join(
                f"{k} {v:.7f}" for k, v in res["mean"].items()
                if isinstance(v, float)))
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view_all, f, indent=2)
