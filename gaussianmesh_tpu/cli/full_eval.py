"""Batch evaluation driver — full_eval.py parity (and, unlike the
reference, one that invokes scripts that actually exist: the reference
inherited a call to a nonexistent train.py from upstream 3DGS,
SURVEY.md §2.1).

    python -m gaussianmesh_tpu.cli.full_eval --base <datasets_root> \
        --scenes scene1 scene2 --meshes m1.obj m2.obj --output <out_root>
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Batch train/render/eval")
    parser.add_argument("--base", required=True,
                        help="root directory containing the scene folders")
    parser.add_argument("--scenes", nargs="+", required=True)
    parser.add_argument("--meshes", nargs="+", required=True,
                        help="proxy mesh per scene (parallel to --scenes)")
    parser.add_argument("--output", default="./eval_output")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--iterations", type=int, default=30_000)
    parser.add_argument("--with_bg", action="store_true")
    args = parser.parse_args(argv)
    assert len(args.scenes) == len(args.meshes)

    from gaussianmesh_tpu.cli import (metrics as cli_metrics,
                                      render as cli_render,
                                      train_bg as cli_train_bg,
                                      train_mesh as cli_train_mesh)

    model_paths = []
    for scene, mesh in zip(args.scenes, args.meshes):
        src = os.path.join(args.base, scene)
        model = os.path.join(args.output, scene)
        model_paths.append(model)
        if not args.skip_training:
            cli_train_mesh.main(["-s", src, "-m", model, "--input_mesh",
                                 mesh, "--eval", "--iterations",
                                 str(args.iterations)])
            if args.with_bg:
                cli_train_bg.main(["-s", src, "-m", model, "--eval",
                                   "--iterations", str(args.iterations)])
        if not args.skip_rendering:
            rargs = ["-m", model, "--skip_train"]
            if args.with_bg:
                rargs.append("--with_bg")
            cli_render.main(rargs)
    if not args.skip_metrics:
        cli_metrics.main(["-m"] + model_paths)


if __name__ == "__main__":
    main()
