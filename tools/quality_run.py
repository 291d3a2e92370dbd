"""Config-2 quality artifact: train a synthetic object on the real TPU at
>= 400x400 and record the PSNR trajectory at reference-style checkpoints.

Mirrors the reference protocol (/root/reference/train_mesh_gaussian.py:
176-211 — eval at fixed iterations on held-out views) scaled to this
container: a procedurally-textured teacher sphere rendered at 448x448
from 48 poses, a coarse proxy mesh for the student, densification on,
eval checkpoints at {500, 1000, 3000, 7000}. Writes
results/config2_quality.json with the full trajectory + metrics and is
reproducible with one command:

    python tools/quality_run.py [workdir]

(On a machine without the TPU it runs on CPU — slowly; pass
GM_QUALITY_SMALL=1 for a smoke-scale run.)
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SMALL = bool(os.environ.get("GM_QUALITY_SMALL"))
# GM_QUALITY_PROTOCOL=1: the reference's FULL config-2 protocol
# (train_mesh_gaussian.py:64-148 / arguments/__init__.py:73-88): 30K
# iterations, >= 100K Gaussians after init subdivision, densify every
# 200 in (500, 15000], opacity reset every 3000, eval at 7K/30K — plus
# evals bracketing the iter-3000 opacity reset ({2950, 3000, 3050}) to
# pin the mid-training PSNR dip to the reset (the eval at 3000 runs
# AFTER the reset fires, exactly like the reference's training_report
# ordering at test iterations).
PROTOCOL = bool(os.environ.get("GM_QUALITY_PROTOCOL"))
W = H = 128 if SMALL else 448
N_CAMS = 12 if SMALL else 48
# GM_QUALITY_ITERS overrides the iteration count (the protocol's 30K at
# >=100K gaussians runs ~2h behind this container's relay; shorter runs
# still exercise the full protocol mechanics and log it/s so the gap to
# 30K is explicit)
ITERS = int(os.environ.get("GM_QUALITY_ITERS", 0)) or (
    300 if SMALL else (30000 if PROTOCOL else 7000))
EVAL_ITERS = ([100, 300] if SMALL else
              [1000, 2950, 3000, 3050, 7000, 15000, 30000] if PROTOCOL
              else [500, 1000, 3000, 7000])
EVAL_ITERS = [i for i in EVAL_ITERS if i <= ITERS]
if ITERS not in EVAL_ITERS:
    EVAL_ITERS.append(ITERS)
INIT_TARGET = 500 if SMALL else (100_000 if PROTOCOL else 20000)
FOVX = 0.8


def make_dataset(root):
    """Blender-style synthetic dataset from a high-frequency-textured
    teacher sphere (fine enough that a broken SSIM weighting or densify
    threshold shows up as a PSNR regression)."""
    from gaussianmesh_tpu.cli.render import save_image
    from gaussianmesh_tpu.data.cameras import Camera
    from gaussianmesh_tpu.io import mesh as mesh_io
    from gaussianmesh_tpu.models import mesh_gaussians as mgs
    from gaussianmesh_tpu.models import render as render_mod
    from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
    from gaussianmesh_tpu.utils import sh as sh_utils
    from tests.meshes import icosphere

    lvl = 2 if SMALL else 4
    v, f = icosphere(lvl)                      # 5120 faces at lvl 4
    cap = f.shape[0] + 8
    p, b, _, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                      capacity=cap, vertex_capacity=4 * cap)
    cent = np.asarray(mgs.get_xyz(p, b))
    # procedural multi-band texture: angular stripes + checker
    cols = np.stack([
        0.5 + 0.45 * np.sin(9.0 * cent[:, 0] + 5.0 * cent[:, 1]),
        0.5 + 0.45 * np.sin(7.0 * cent[:, 1] - 4.0 * cent[:, 2]),
        0.5 + 0.45 * np.sign(np.sin(6.0 * cent[:, 2]) * np.sin(8.0 * cent[:, 0])) * 0.9,
    ], axis=-1)
    p = p.replace(
        features_dc=jnp.asarray(sh_utils.rgb_to_sh(cols))[:, None, :].astype(jnp.float32),
        opacity=jnp.full_like(p.opacity, 6.0))
    cfg = RasterizerConfig(width=W, height=H, max_per_tile=512,
                           use_pallas=jax.default_backend() == "tpu")

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames_tr, frames_te = [], []
    n_total = N_CAMS + max(4, N_CAMS // 6)
    for i in range(n_total):
        az = 2 * np.pi * i / n_total * 3.1           # winds around 3x
        el = 0.9 * np.sin(i * 0.71)
        pos = 3.2 * np.array([np.cos(el) * np.sin(az), np.sin(el),
                              np.cos(el) * np.cos(az)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], axis=1)
        T = -R.T @ pos
        cam = Camera(uid=i, R=R, T=T, fovx=FOVX, fovy=FOVX,
                     image=np.zeros((3, H, W), np.float32))
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos
        c2w[:3, 1:3] *= -1
        arrays = render_mod.mesh_model_arrays(p, b, cam.arrays(), 0)
        out = render_mod.render(arrays, cam.arrays(), cfg, jnp.ones(3))
        save_image(os.path.join(root, "train", f"r_{i}.png"), out.color)
        rec = {"file_path": f"train/r_{i}", "transform_matrix": c2w.tolist()}
        (frames_te if i % 8 == 7 else frames_tr).append(rec)

    with open(os.path.join(root, "transforms_train.json"), "w") as fj:
        json.dump({"camera_angle_x": FOVX, "frames": frames_tr}, fj)
    with open(os.path.join(root, "transforms_test.json"), "w") as fj:
        json.dump({"camera_angle_x": FOVX, "frames": frames_te}, fj)

    if PROTOCOL:
        # 1600-face student proxy: 1:4-subdivides to 102,400 gaussians,
        # just past the reference's >= 100K init floor (icosphere face
        # counts jump 81,920 -> 327,680 and overshoot 3x)
        from tests.meshes import uv_sphere
        pv, pf = uv_sphere(40, 21)
    else:
        pv, pf = icosphere(1 if SMALL else 2)  # coarse student proxy
    mesh_path = os.path.join(root, "proxy.obj")
    mesh_io.write_triangle_mesh(mesh_path, pv, pf)
    return mesh_path


def main():
    from gaussianmesh_tpu.cli import metrics as cli_metrics
    from gaussianmesh_tpu.cli import render as cli_render
    from gaussianmesh_tpu.cli import train_mesh as cli_train

    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gm_quality"
    data = os.path.join(work, "data")
    model = os.path.join(work, "model")
    os.makedirs(data, exist_ok=True)
    print(f"[quality] dataset {W}x{H}, {N_CAMS} cams -> {data}", flush=True)
    mesh_path = make_dataset(data)

    t0 = time.time()
    ev = [str(i) for i in EVAL_ITERS]
    train_args = [
        "-s", data, "-m", model, "--input_mesh", mesh_path,
        "--iterations", str(ITERS), "--init_target", str(INIT_TARGET),
        "--eval", "--sh_degree", "2",
        "--densify_from_iter", "500" if PROTOCOL else "300",
        "--densify_until_iter",
        "15000" if PROTOCOL else str(int(ITERS * 0.6)),
        "--densification_interval", "200",
        "--opacity_reset_interval", "3000",
        "--test_iterations", *ev, "--save_iterations", *ev,
        "--max_per_tile", "768"]
    if PROTOCOL:
        # 102K gaussians at 448^2: coverage-bound pair counts, so the
        # default 10x/4x per-gaussian capacities would walk a mostly-
        # empty blend grid; overflow stays counted + reported
        train_args += ["--pair_capacity_per_gaussian", "6",
                       "--row_capacity_per_gaussian", "3"]
    cli_train.main(train_args)
    train_s = time.time() - t0
    print(f"[quality] trained {ITERS} iters in {train_s:.0f}s "
          f"({ITERS / train_s:.2f} it/s)", flush=True)

    traj = {}
    for it in EVAL_ITERS:
        cli_render.main(["-m", model, "--iteration", str(it),
                         "--skip_train"])
        # LPIPS_uncalibrated: deterministic seed-0 graph weights
        # (eval/lpips.py::random_weights) — trajectory DELTAS are
        # meaningful; the absolute value is NOT comparable to published
        # LPIPS (calibrated field stays null without pretrained VGG16)
        cli_metrics.main(["-m", model, "--lpips_uncalibrated"])
        with open(os.path.join(model, "results.json")) as f:
            res = json.load(f)
        traj[str(it)] = res[f"ours_{it}"]
        print(f"[quality] iter {it}: {traj[str(it)]}", flush=True)

    out = {
        "config": 2,
        "protocol": ("train_mesh_gaussian.py full protocol: 30K iters, "
                     ">=100K gaussians, densify every 200 in (500,15000], "
                     "opacity reset every 3000; eval on held-out views "
                     "(every 8th)" if PROTOCOL else
                     "train_mesh_gaussian.py-style eval at fixed iters "
                     "on held-out views (every 8th)"),
        "resolution": [W, H],
        "iterations": ITERS,
        "init_target": INIT_TARGET,
        "backend": jax.default_backend(),
        "train_seconds": round(train_s, 1),
        "iters_per_second": round(ITERS / train_s, 2),
        "trajectory": traj,
        "lpips_note": ("LPIPS_uncalibrated uses the deterministic seed-0 "
                       "graph weights (eval/lpips.py::random_weights): "
                       "trajectory deltas are meaningful, absolute values "
                       "are NOT comparable to published LPIPS; the "
                       "calibrated LPIPS field stays null in this "
                       "zero-egress container (no pretrained VGG16)"),
        "reset_note": ("evals at {2950, 3000, 3050} bracket the "
                       "iter-3000 opacity reset: the dip AT 3000 is the "
                       "eval running right after the reset (reference "
                       "ordering), not a training bug"
                       if PROTOCOL else None),
        "reproduce": ("GM_QUALITY_PROTOCOL=1 python tools/quality_run.py"
                      if PROTOCOL else "python tools/quality_run.py"),
    }
    os.makedirs("/root/repo/results", exist_ok=True)
    # smoke runs must never clobber the committed full-scale artifact
    path = ("/root/repo/results/config2_quality_smoke.json" if SMALL
            else "/root/repo/results/config2_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
