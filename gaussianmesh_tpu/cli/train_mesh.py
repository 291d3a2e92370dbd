"""Train the mesh-bound foreground model — train_mesh_gaussian.py parity.

    python -m gaussianmesh_tpu.cli.train_mesh -s <data> -m <out> \
        --input_mesh proxy.obj [--is_exist_bg] [--iterations 30000]
"""

from __future__ import annotations

import os
import sys

from gaussianmesh_tpu import config as cfg_mod
from gaussianmesh_tpu.cli.common import base_parser, setup_cache


def main(argv=None) -> None:
    parser = base_parser("Train mesh-bound Gaussians (TPU)")
    parser.add_argument("--input_mesh", type=str, required=True)
    parser.add_argument("--is_exist_bg", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--auto_resume", action="store_true", default=False,
                        help="resume from the latest chkpnt*.ckpt in the "
                             "model dir (crash recovery)")
    parser.add_argument("--init_target", type=int, default=100_000)
    args = parser.parse_args(argv)
    setup_cache()

    model = cfg_mod.extract(cfg_mod.ModelParams, args)
    opt = cfg_mod.extract(cfg_mod.OptimizationParams, args)
    pipe = cfg_mod.extract(cfg_mod.PipelineParams, args)
    rt = cfg_mod.extract(cfg_mod.RuntimeParams, args)
    if not model.model_path:
        model = cfg_mod.ModelParams(**{**model.__dict__,
                                       "model_path": os.path.join(
                                           "output", "mesh_gaussian")})
    cfg_mod.save_cfg(model.model_path, {"model": model, "pipeline": pipe,
                                        "optimization": opt, "runtime": rt})

    from gaussianmesh_tpu.io import mesh as mesh_io
    from gaussianmesh_tpu.scene import Scene
    from gaussianmesh_tpu.train.loss import psnr
    from gaussianmesh_tpu.train.trainer import DeviceDataset, MeshTrainer

    scene = Scene(model, is_exist_bg=args.is_exist_bg, seed=rt.seed)
    scene.write_static_artifacts()
    ds = DeviceDataset.from_cameras(scene.train_cameras)
    v, f = mesh_io.read_triangle_mesh(args.input_mesh)
    print(f"[train] proxy mesh: {v.shape[0]} verts, {f.shape[0]} faces; "
          f"{len(scene.train_cameras)} train cams; "
          f"extent {scene.cameras_extent:.3f}")

    trainer = MeshTrainer(v, f, ds, opt, rt,
                          spatial_lr_scale=scene.cameras_extent,
                          white_background=model.white_background,
                          is_exist_bg=args.is_exist_bg,
                          init_target=args.init_target,
                          max_sh_degree=model.sh_degree)
    from gaussianmesh_tpu.utils.logging import TrainLogger
    trainer.logger = TrainLogger(model.model_path)
    ckpt_path = args.start_checkpoint
    if args.auto_resume and not ckpt_path:
        import glob
        # both flavors: msgpack files (chkpntN.ckpt) and orbax sharded
        # directories (chkpntN.ckpt.orbax)
        found = glob.glob(os.path.join(model.model_path, "chkpnt*.ckpt")) \
            + glob.glob(os.path.join(model.model_path, "chkpnt*.ckpt.orbax"))
        if found:
            ckpt_path = max(found, key=lambda f: int(
                "".join(ch for ch in os.path.basename(f) if ch.isdigit())))
    if ckpt_path:
        trainer.load_ckpt(ckpt_path)
        print(f"[train] resumed from {ckpt_path} at iter {trainer.global_it}")
    print(f"[train] {int(trainer.binding.alive.sum())} gaussians after init")

    # boundaries beyond the requested iteration count are dropped (the
    # default 7K/30K test/save points must not extend a short run)
    test_iters = {b for b in args.test_iterations if b <= opt.iterations}
    save_iters = {b for b in args.save_iterations if b <= opt.iterations}
    ckpt_iters = {b for b in args.checkpoint_iterations
                  if b <= opt.iterations}

    def cb(m):
        print(f"  iter {m['iter']:>6d}  loss {m['loss']:.5f}  "
              f"n {m['n_alive']}  {m['elapsed']:.0f}s", flush=True)

    boundaries = sorted(test_iters | save_iters | ckpt_iters
                        | {opt.iterations})
    prev = trainer.global_it
    test_ds = (DeviceDataset.from_cameras(scene.test_cameras)
               if scene.test_cameras and test_iters else None)
    for b in boundaries:
        if b <= prev:
            continue
        trainer.train(iterations=b - prev, log_every=200, callback=cb)
        prev = b
        if b in save_iters or b == opt.iterations:
            print(f"[ITER {b}] Saving Gaussians")
            trainer.save(scene.iteration_dir(b))
        if b in ckpt_iters:
            trainer.save_ckpt(
                os.path.join(model.model_path, f"chkpnt{b}.ckpt"))
        if b in test_iters and test_ds is not None:
            vals = []
            import jax.numpy as jnp
            for i in range(test_ds.images.shape[0]):
                out = trainer.render_view(test_ds.camera(jnp.int32(i)))
                gt = test_ds.images[i].astype(jnp.float32) / 255.0
                vals.append(float(psnr(out.color, gt)))
            print(f"[ITER {b}] test PSNR {sum(vals) / len(vals):.2f}")


if __name__ == "__main__":
    main()
