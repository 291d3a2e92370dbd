"""Interactive model viewer — HTTP analog of the reference's SIBR remote
viewer (gaussian_renderer/network_gui.py, vestigial there).

    python -m gaussianmesh_tpu.cli.viewer -m <model_dir> \
        [--gaussian_ply <trained.ply>] [--bg_ply <bg.ply>] \
        [--origin_mesh mesh.obj --deformed_mesh def.obj] \
        [--port 6017] [--width 800 --height 600]

Serves an orbit-control page at http://host:port/ rendering the trained
model live; with --deformed_mesh the deformed state is shown.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from gaussianmesh_tpu import config as cfg_mod
from gaussianmesh_tpu.cli.common import base_parser, setup_cache


def main(argv=None) -> None:
    parser = base_parser("Interactive HTTP viewer (TPU)")
    parser.add_argument("--gaussian_ply", type=str, default=None,
                        help="foreground ply (default: latest "
                             "point_cloud/iteration_*/point_cloud.ply)")
    parser.add_argument("--bg_ply", type=str, default=None)
    parser.add_argument("--origin_mesh", type=str, default=None)
    parser.add_argument("--deformed_mesh", type=str, default=None)
    parser.add_argument("--port", type=int, default=6017)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--width", type=int, default=800)
    parser.add_argument("--height", type=int, default=600)
    parser.add_argument("--white_bg", action="store_true")
    args = parser.parse_args(argv)
    setup_cache()

    groups = cfg_mod.load_combined(args.model_path or "", args)
    model, rt = groups["model"], groups["runtime"]

    from gaussianmesh_tpu.edit.runtime import SceneEditor
    from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
    from gaussianmesh_tpu.scene import Scene
    from gaussianmesh_tpu.viewer import ViewerServer, editor_render_fn

    ply = args.gaussian_ply
    if ply is None:
        it = Scene.find_latest_iteration(model.model_path)
        ply = os.path.join(model.model_path, "point_cloud",
                           f"iteration_{it}", "point_cloud.ply")
    if args.origin_mesh:
        editor = SceneEditor(bg_ply_path=args.bg_ply,
                             max_sh_degree=model.sh_degree)
        editor.add_object(ply, args.origin_mesh, name="object")
        if args.deformed_mesh:
            editor.deform_object("object", args.deformed_mesh)
        center = np.asarray(editor.objects["object"].pos0.mean(axis=0))
    else:
        # no proxy mesh: serve the gaussians as a frozen model (the
        # SceneEditor bg path renders a plain gaussian ply as-is)
        editor = SceneEditor(bg_ply_path=ply, max_sh_degree=model.sh_degree)
        xyz = np.asarray(editor._bg_params.xyz)
        alive = np.asarray(editor._bg_alive)
        center = xyz[alive].mean(axis=0) if alive.any() else np.zeros(3)

    cfg = RasterizerConfig(
        width=args.width, height=args.height,
        max_per_tile=rt.max_per_tile,
        
        blend_chunk=rt.blend_chunk,
        use_pallas=rt.use_pallas and jax.default_backend() == "tpu")
    bg = (1.0, 1.0, 1.0) if args.white_bg else (0.0, 0.0, 0.0)
    server = ViewerServer(editor_render_fn(editor, cfg, bg),
                          width=args.width, height=args.height,
                          host=args.host, port=args.port,
                          center=tuple(np.asarray(center, float)))
    server.start()
    print(f"[viewer] serving http://{server.host}:{server.port}/ "
          f"(ctrl-c to stop)")
    try:
        import time
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
