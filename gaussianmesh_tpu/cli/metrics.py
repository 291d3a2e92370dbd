"""Evaluate rendered outputs — metrics.py parity.

    python -m gaussianmesh_tpu.cli.metrics -m <model_dir> [<model_dir> ...]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Metrics (PSNR/SSIM/LPIPS)")
    parser.add_argument("--model_paths", "-m", nargs="+", type=str,
                        required=True)
    parser.add_argument("--lpips_weights", type=str, default=None)
    parser.add_argument("--lpips_uncalibrated", action="store_true",
                        help="without pretrained weights, report the "
                             "seed-weight LPIPS graph as "
                             "LPIPS_uncalibrated (relative ranking only; "
                             "NOT comparable to published LPIPS)")
    args = parser.parse_args(argv)
    from gaussianmesh_tpu.cli.common import setup_cache
    setup_cache()

    from gaussianmesh_tpu.eval.metrics import evaluate_model_paths
    evaluate_model_paths(args.model_paths, args.lpips_weights,
                         lpips_uncalibrated=args.lpips_uncalibrated)


if __name__ == "__main__":
    main()
