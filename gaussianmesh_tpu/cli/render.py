"""Render train/test splits of a trained model — render.py parity.

    python -m gaussianmesh_tpu.cli.render -m <model_dir> [--iteration N]
        [--skip_train] [--skip_test] [--with_bg]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from gaussianmesh_tpu import config as cfg_mod
from gaussianmesh_tpu.cli.common import base_parser, save_image, setup_cache


def main(argv=None) -> None:
    parser = base_parser("Render a trained model (TPU)")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--with_bg", action="store_true",
                        help="composite the trained background model")
    args = parser.parse_args(argv)
    setup_cache()

    groups = cfg_mod.load_combined(args.model_path or "", args)
    model, rt = groups["model"], groups["runtime"]

    from gaussianmesh_tpu.io import gaussian_ply
    from gaussianmesh_tpu.models import render as render_mod
    from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
    from gaussianmesh_tpu.scene import Scene

    it = args.iteration
    if it == -1:
        it = Scene.find_latest_iteration(model.model_path)
    pc_dir = os.path.join(model.model_path, "point_cloud", f"iteration_{it}")
    fg_params, fg_binding, _ = gaussian_ply.load_mesh_gaussian_ply(
        os.path.join(pc_dir, "point_cloud.ply"), max_sh_degree=model.sh_degree)
    bg_model = None
    bg_ply = os.path.join(pc_dir, "bg_point_cloud.ply")
    if args.with_bg:
        if os.path.exists(bg_ply):
            bg_model = gaussian_ply.load_gaussian_ply(
                bg_ply, max_sh_degree=model.sh_degree)
        else:
            raise SystemExit(
                f"--with_bg: {bg_ply} not found (run train_bg, or pick the "
                f"iteration it saved at)")

    scene = Scene(model, shuffle=False)
    bg_color = jnp.ones(3) if model.white_background else jnp.zeros(3)

    def render_set(name: str, cams) -> None:
        if not cams:
            return
        base = os.path.join(model.model_path, name, f"ours_{it}")
        for idx, cam in enumerate(cams):
            ca = cam.arrays()
            cfg = RasterizerConfig(
                width=cam.width, height=cam.height,
                max_per_tile=rt.max_per_tile,
                
                blend_chunk=rt.blend_chunk,
                use_pallas=rt.use_pallas and jax.default_backend() == "tpu")
            arrays = render_mod.mesh_model_arrays(fg_params, fg_binding, ca,
                                                  model.sh_degree)
            if bg_model is not None:
                bg_arrays = render_mod.gaussian_model_arrays(
                    bg_model[0], bg_model[1], ca, model.sh_degree)
                arrays = render_mod.concat_arrays(arrays, bg_arrays)
            out = render_mod.render(arrays, ca, cfg, bg_color)
            save_image(os.path.join(base, "renders", f"{idx:05d}.png"),
                       out.color)
            if cam.image is not None:
                save_image(os.path.join(base, "gt", f"{idx:05d}.png"),
                           cam.image)
            print(f"  {name} {idx + 1}/{len(cams)}", end="\r", flush=True)
        print()

    if not args.skip_train:
        render_set("train", scene.train_cameras)
    if not args.skip_test:
        render_set("test", scene.test_cameras)


if __name__ == "__main__":
    main()
