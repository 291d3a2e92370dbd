"""Deformation-playback benchmarks: BASELINE configs 3 and 5 on the chip.

Config 3 — single-object mesh-sequence playback at 1080p: a synthetic
trained-style object (~82K near-opaque mesh-bound Gaussians on an
icosphere proxy) driven by a twisting vertex sequence through the FULL
per-frame pipeline (one-ring deformation gradients -> polar R/S ->
barycentric transfer -> SH at rotated view dirs -> rasterize), fused per
frame and batched per dispatch (edit/runtime.playback_sequence). The
reference's claim being raced: "Real-time Large-scale Deformation"
(/root/reference/README.md:1-3), i.e. >= 30 fps.

Config 5 — multi-object + background composite playback at 1080p: three
objects (one deforming per frame) + a 100K-Gaussian background model
composited and rasterized per frame (parallel.edit_step on a (1, 1)
mesh: the same fused frame function the sharded regime uses).

Writes results/playback.json and prints one JSON line:
  {"metric": "playback_fps_1080p", ...,
   "detail": {"config3_fps": ..., "config5_fps": ...}}
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

WIDTH, HEIGHT = 1920, 1080
FRAMES = 64

_CAL = None


def _calibration() -> float:
    """Per-dispatch relay overhead (seconds) — the axon relay polls
    completion on a ~30 ms tick, so subtract one tick per dispatch."""
    global _CAL
    if _CAL is None:
        @jax.jit
        def empty(x):
            out, _ = jax.lax.scan(lambda c, _: (c + x * 1e-30, None),
                                  jnp.float32(0.0), None, length=4)
            return out
        x = jnp.float32(1.0)
        jax.block_until_ready(empty(x))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(empty(x))
            samples.append(time.perf_counter() - t0)
        _CAL = min(samples)
    return _CAL


def _twist_frames(v: np.ndarray, n_frames: int, amp=0.6) -> np.ndarray:
    out = []
    for i in range(n_frames):
        a = amp * np.sin(2 * np.pi * i / n_frames)
        ang = a * v[:, 2]
        c, s = np.cos(ang), np.sin(ang)
        out.append(np.stack([c * v[:, 0] - s * v[:, 1],
                             s * v[:, 0] + c * v[:, 1], v[:, 2]], axis=-1))
    return np.stack(out).astype(np.float32)


def _make_object(tmp: str, level: int, name: str, offset=(0, 0, 0),
                 opacity_logit=4.0):
    """Synthetic trained-style object: one near-opaque Gaussian per face
    of an icosphere, saved as PLY + OBJ for the edit runtime loaders."""
    from gaussianmesh_tpu.io import gaussian_ply, mesh as mesh_io
    from gaussianmesh_tpu.models import mesh_gaussians as mgs
    from gaussianmesh_tpu.utils import sh as sh_utils
    from tests.meshes import icosphere

    v, f = icosphere(level)
    v = v + np.asarray(offset, np.float32)
    n = f.shape[0]
    p, b, _, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                      capacity=n, vertex_capacity=4 * n)
    cent = np.asarray(mgs.get_xyz(p, b))
    cols = (cent - cent.min(0)) / (np.ptp(cent, 0) + 1e-6)
    p = p.replace(
        features_dc=jnp.asarray(sh_utils.rgb_to_sh(cols))[:, None, :].astype(
            jnp.float32),
        opacity=jnp.full_like(p.opacity, opacity_logit))
    ply = os.path.join(tmp, f"{name}.ply")
    obj = os.path.join(tmp, f"{name}.obj")
    gaussian_ply.save_mesh_gaussian_ply(ply, p, b)
    mesh_io.write_triangle_mesh(obj, v, f)
    return ply, obj, v, f


def main():
    import tempfile
    from gaussianmesh_tpu.edit.runtime import (ObjectDeformer, SceneEditor,
                                               playback_sequence)
    from gaussianmesh_tpu.io import gaussian_ply
    from gaussianmesh_tpu.models import gaussians as gs
    from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
    from tests.scenes import look_at_camera

    tmp = tempfile.mkdtemp(prefix="gm_playback_")
    cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
    out = {"backend": jax.default_backend(), "width": WIDTH,
           "height": HEIGHT, "frames": FRAMES}

    # ---------------- config 3: single object ----------------
    ply, objpath, v, f = _make_object(tmp, level=6, name="main")
    obj = ObjectDeformer(ply, objpath)
    n_g = int(obj.n)
    out["config3_n_gauss"] = n_g
    out["config3_proxy"] = {"verts": int(v.shape[0]), "faces": int(f.shape[0])}
    cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                           blend_chunk=256, use_pallas=True)
    frames = jnp.asarray(_twist_frames(v, FRAMES))

    # ONE dispatch for the whole sequence: every frame rendered in a
    # lax.map, returning per-frame image means (the full image is
    # consumed by the mean, so no frame's rasterization is dead code and
    # no multi-GB image stack is materialized). With a single dispatch
    # in the timing window, the relay's ~30 ms completion tick is <= one
    # tick over all FRAMES frames — the raw number is honest on its own
    # and the corrected one subtracts exactly one measured dispatch
    # overhead (no multi-dispatch accounting model to get wrong).
    from gaussianmesh_tpu.edit.runtime import _playback_fns
    frame_fn, _ = _playback_fns(obj, cam, cfg, None)

    @jax.jit
    def run_means(vs):
        return jax.lax.map(lambda vd: jnp.mean(frame_fn(vd)), vs)

    means = run_means(frames)
    _ = float(means[-1])                             # compile + fetch-sync
    t0 = time.perf_counter()
    means = run_means(frames)
    _ = float(means[-1])                             # fetch-sync (small out)
    raw = time.perf_counter() - t0
    dt = (raw - _calibration()) / FRAMES
    out["config3_ms_per_frame_raw"] = round(raw / FRAMES * 1e3, 2)
    out["config3_ms_per_frame"] = round(dt * 1e3, 2)
    out["config3_fps"] = round(1.0 / dt, 1)
    out["config3_mean_px"] = float(jnp.mean(means))
    # one full frame rendered outside the timing window as an image
    # sanity check (playback_sequence is the product path; its own cache
    # reuses frame_fn's compile)
    img3 = playback_sequence(obj, cam, cfg, frames[-1:], batch=1)
    out["config3_frame_px"] = float(jnp.mean(img3))

    # ---------------- config 5: multi-object + background ----------------
    editor = SceneEditor()
    editor.add_object(ply, objpath, name="main")
    for i, off in enumerate([(2.2, 0.6, 0.0), (-2.2, -0.6, 0.3)]):
        p2, o2, _, _ = _make_object(tmp, level=4, name=f"side{i}",
                                    offset=off)
        editor.add_object(p2, o2, name=f"side{i}")
    # background: 100K random vanilla Gaussians around the scene
    rng = np.random.default_rng(0)
    nbg = 100_000
    bgp, bg_state = gs.create_from_points(
        jnp.asarray(rng.uniform(-6, 6, (nbg, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (nbg, 3)).astype(np.float32)),
        capacity=nbg, max_sh_degree=1)
    bgp = bgp.replace(scaling=jnp.full((nbg, 3), np.log(0.05), jnp.float32))
    bg_ply = os.path.join(tmp, "bg.ply")
    gaussian_ply.save_gaussian_ply(bg_ply, bgp, bg_state.alive)
    editor._bg_params, editor._bg_alive = gaussian_ply.load_gaussian_ply(
        bg_ply, max_sh_degree=1)
    editor._bg_sh_degree = 1
    out["config5_n_gauss_total"] = int(
        sum(int(o.n) for o in editor.objects.values()) + nbg)

    # fused composite frame fn: the static objects + background are
    # pre-expanded ONCE into a cached pair domain (rasterize_composite)
    # — only the deforming object re-runs preprocess/expansion per
    # frame. Frames batched per dispatch so the relay tick amortizes
    # exactly like config 3.
    from gaussianmesh_tpu.edit.runtime import (deformed_object_arrays,
                                               make_composite_playback_fn)
    from gaussianmesh_tpu.models.render import concat_arrays
    main_obj = editor.objects["main"]
    static_arrays = None
    for name, other in editor.objects.items():
        if name == "main":
            continue
        a = other.arrays(cam)
        static_arrays = a if static_arrays is None else concat_arrays(
            static_arrays, a)
    static_arrays = concat_arrays(static_arrays, editor._bg_arrays(cam))
    import dataclasses
    cfg5 = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                            blend_chunk=256, use_pallas=True)
    bg_color = jnp.zeros(3)
    # static pair capacity sized to the static set's load (bg splats are
    # small; ~5 live pairs/gaussian measured) — see make_composite_
    # playback_fn's static_cfg contract; overflow is counted in-frame
    frame5 = make_composite_playback_fn(
        editor, "main", cam, cfg5, bg_color,
        static_cfg=dataclasses.replace(cfg5, pair_capacity_per_gaussian=8,
                                       row_capacity_per_gaussian=3))

    @jax.jit
    def run5_means(vs):
        return jax.lax.map(lambda vd: jnp.mean(frame5(vd)), vs)

    means5 = run5_means(frames)
    _ = float(means5[-1])                            # compile + fetch-sync
    t0 = time.perf_counter()
    means5 = run5_means(frames)
    _ = float(means5[-1])
    raw5 = time.perf_counter() - t0
    dt5 = (raw5 - _calibration()) / FRAMES
    out["config5_ms_per_frame_raw"] = round(raw5 / FRAMES * 1e3, 2)
    out["config5_ms_per_frame"] = round(dt5 * 1e3, 2)
    out["config5_fps"] = round(1.0 / dt5, 1)
    out["config5_mean_px"] = float(jnp.mean(means5))

    # --- config 5, tile axis (parallel/edit_step regime) ---------------
    # BASELINE config 5 is "multi-host tile+Gaussian sharded real-time
    # deformation": the edit_step forward path has NO collectives
    # (deform/preprocess replicated; bands disjoint), so per-device
    # per-frame latency IS the per-band critical path. One real chip
    # here: each band of the D-way split is measured separately (same
    # emulation style as tools/bench_scaling.py's tile_bands) and the
    # critical path (max band) reported per D. Compute is MEASURED; the
    # multi-chip claim assumes only that D chips run their bands
    # concurrently (no communication to model on this path).
    from gaussianmesh_tpu.models.render import GaussianArrays  # noqa: F401
    from gaussianmesh_tpu.parallel.train_step import rasterize_band
    tile_axis = {}
    for d in (2, 4):
        gy = (HEIGHT + 15) // 16
        gy_pad = -(-gy // d) * d
        h_pad = gy_pad * 16
        gy_local = gy_pad // d
        # LOAD-SIZED band capacities (the bench_scaling lesson): an
        # unscaled capacity makes every band walk the full one-device
        # blend grid and measures capacity waste, not compute; overflow
        # stays counted and recorded below
        bcfg = RasterizerConfig(width=WIDTH, height=h_pad,
                                max_per_tile=1024, blend_chunk=256,
                                pair_capacity_per_gaussian=max(
                                    2, -(-10 // d) + 1),
                                row_capacity_per_gaussian=max(
                                    1, -(-4 // d)),
                                use_pallas=True)

        def frame_band(v_def, y0, d=d, bcfg=bcfg, gy_local=gy_local):
            arrays = concat_arrays(
                deformed_object_arrays(main_obj, v_def, cam),
                static_arrays)
            o = rasterize_band(arrays, cam, bcfg, gy_local, y0, bg_color)
            ovf = (o.tile_overflow + o.rect_overflow + o.pair_overflow)
            return jnp.mean(o.color), ovf

        @jax.jit
        def runb_means(vs, y0):
            return jax.lax.map(lambda vd: frame_band(vd, y0), vs)

        per_band = []
        band_ovf = []
        for k in range(d):
            y0 = jnp.asarray(k * gy_local, jnp.int32)
            ms_, ov_ = runb_means(frames, y0)
            _ = float(ms_[-1])
            t0 = time.perf_counter()
            ms_, ov_ = runb_means(frames, y0)
            _ = float(ms_[-1])
            rawb = time.perf_counter() - t0
            per_band.append(round(
                (rawb - _calibration()) / FRAMES * 1e3, 2))
            band_ovf.append(int(jnp.max(ov_)))
        crit = max(per_band)
        tile_axis[d] = {"per_band_ms": per_band, "critical_ms": crit,
                        "fps": round(1e3 / crit, 1),
                        "max_overflow": band_ovf}
    out["config5_tile_axis"] = {
        "note": ("per-band compute MEASURED on one chip (emulated band "
                 "split, edit_step's zero-collective forward); fps = "
                 "1 / critical band latency assuming D concurrent chips"),
        "per_d": tile_axis}

    # ---------------- config 4: bg-composite training step ----------------
    # BASELINE config 4 (mesh + background training): one fwd+bwd step of
    # the BgTrainer composite render (frozen 82K-Gaussian fg + 100K-
    # Gaussian bg) at 1080p, measured over many dispatched steps with the
    # relay tick subtracted.
    # GM_PLAYBACK_SKIP4=1 skips this compile-heavy section (merge
    # keeps the prior artifact's config-4 entries, below)
    try:
        if os.environ.get("GM_PLAYBACK_SKIP4"):
            raise RuntimeError("skipped via GM_PLAYBACK_SKIP4")
        from gaussianmesh_tpu.config import (OptimizationParams,
                                             RuntimeParams)
        from gaussianmesh_tpu.models import mesh_gaussians as mgs
        from gaussianmesh_tpu.train.bg_trainer import BgTrainer
        from gaussianmesh_tpu.train.trainer import DeviceDataset
        from tests.meshes import icosphere

        v6, f6 = icosphere(6)
        n6 = f6.shape[0]
        fp, fb, _, _ = mgs.create_from_mesh(jnp.asarray(v6),
                                            jnp.asarray(f6), capacity=n6,
                                            vertex_capacity=4 * n6)
        fp = fp.replace(opacity=jnp.full_like(fp.opacity, 4.0))
        gt = (np.zeros((1, 3, HEIGHT, WIDTH)) + 0.5).astype(np.float32)
        ds = DeviceDataset(
            view=cam.viewmatrix[None], proj=cam.projmatrix[None],
            campos=cam.campos[None], tanfovx=cam.tanfovx[None],
            tanfovy=cam.tanfovy[None],
            images=jnp.asarray((gt * 255).astype(np.uint8)),
            masks=None, width=WIDTH, height=HEIGHT)
        opt4 = OptimizationParams(densify_from_iter=10**9,
                                  opacity_reset_interval=10**9)
        rt4 = RuntimeParams(max_per_tile=1024, use_pallas=True,
                            capacity=102_400)
        bgt = BgTrainer(fp, fb, rng.uniform(-6, 6, (nbg, 3)).astype(
            np.float32), rng.uniform(0, 1, (nbg, 3)).astype(np.float32),
            ds, opt4, rt4, spatial_lr_scale=4.0)
        bgt.train(iterations=3, log_every=10**9)       # compile + warmup
        steps4 = 30
        t0 = time.perf_counter()
        bgt.train(iterations=steps4, log_every=10**9)
        dt4 = (time.perf_counter() - t0
               - steps4 * _calibration()) / steps4
        out["config4_train_step_ms"] = round(dt4 * 1e3, 2)
        out["config4_it_per_s"] = round(1.0 / dt4, 1)
        out["config4_n_gauss"] = int(n6 + nbg)
    except Exception as e:  # noqa: BLE001 — partial artifact beats none
        out["config4_error"] = f"{type(e).__name__}: {e}"

    os.makedirs("results", exist_ok=True)
    path = "results/playback.json"
    if os.path.exists(path):   # keep entries of skipped sections
        prior = json.load(open(path))
        prior.update(out)
        out = prior
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "metric": "playback_fps_1080p", "value": out["config3_fps"],
        "unit": "fps", "vs_baseline": round(out["config3_fps"] / 30.0, 3),
        "detail": {"config3_fps": out["config3_fps"],
                   "config5_fps": out["config5_fps"],
                   "config3_n_gauss": n_g,
                   "config5_n_gauss_total": out["config5_n_gauss_total"],
                   "file": "results/playback.json"},
    }), flush=True)


if __name__ == "__main__":
    main()
