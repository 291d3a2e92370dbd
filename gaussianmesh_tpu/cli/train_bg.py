"""Train the background model with the frozen foreground —
train_bg_gaussian.py parity.

    python -m gaussianmesh_tpu.cli.train_bg -s <data> -m <model_dir> \
        [--mesh_gaussian_ply <path>] [--iterations 30000]
"""

from __future__ import annotations

import os

from gaussianmesh_tpu import config as cfg_mod
from gaussianmesh_tpu.cli.common import base_parser, setup_cache


def main(argv=None) -> None:
    parser = base_parser("Train background Gaussians (TPU)")
    parser.add_argument("--mesh_gaussian_ply", type=str, default=None)
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--remove_neighbor_gaussian_iterations", nargs="+",
                        type=int, default=[1_000, 10_000])
    args = parser.parse_args(argv)
    setup_cache()

    groups = cfg_mod.load_combined(args.model_path or "", args)
    model, opt, rt = groups["model"], groups["optimization"], groups["runtime"]

    from gaussianmesh_tpu.io import gaussian_ply
    from gaussianmesh_tpu.scene import Scene
    from gaussianmesh_tpu.train.bg_trainer import BgTrainer
    from gaussianmesh_tpu.train.trainer import DeviceDataset

    fg_ply = args.mesh_gaussian_ply
    if fg_ply is None:
        it = Scene.find_latest_iteration(model.model_path)
        fg_ply = os.path.join(model.model_path, "point_cloud",
                              f"iteration_{it}", "point_cloud.ply")
    print(f"[train_bg] frozen foreground: {fg_ply}")
    fg_params, fg_binding, _ = gaussian_ply.load_mesh_gaussian_ply(
        fg_ply, max_sh_degree=model.sh_degree)

    scene = Scene(model, is_exist_bg=True, seed=rt.seed)
    ds = DeviceDataset.from_cameras(scene.train_cameras)
    pcd = scene.info.point_cloud

    trainer = BgTrainer(fg_params, fg_binding, pcd.points, pcd.colors, ds,
                        opt, rt, spatial_lr_scale=scene.cameras_extent,
                        white_background=model.white_background,
                        max_sh_degree=model.sh_degree,
                        remove_neighbor_iterations=tuple(
                            args.remove_neighbor_gaussian_iterations))

    def cb(m):
        print(f"  iter {m['iter']:>6d}  loss {m['loss']:.5f}  "
              f"n {m['n_alive']}  {m['elapsed']:.0f}s", flush=True)

    save_iters = sorted({b for b in args.save_iterations
                         if b <= opt.iterations} | {opt.iterations})
    prev = trainer.global_it
    for b in save_iters:
        if b <= prev:
            continue
        trainer.train(iterations=b - prev, log_every=200, callback=cb)
        prev = b
        print(f"[ITER {b}] Saving bg Gaussians")
        trainer.save(scene.iteration_dir(b))


if __name__ == "__main__":
    main()
