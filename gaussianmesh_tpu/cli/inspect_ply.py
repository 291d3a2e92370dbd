"""Inspect / diff Gaussian PLY artifacts.

The reference ships `convert_data.py` (a torch-dump -> numpy converter,
its team's cross-framework parity tool, /root/reference/convert_data.py).
The equivalent need here is artifact-level: print the schema and
statistics of a trained PLY (ours or the reference's — the schemas match,
scene/mesh_based_gaussian_model.py:290-332), and numerically diff two
PLYs field by field for interop checks.

    python -m gaussianmesh_tpu.cli.inspect_ply model.ply [other.ply]
"""

from __future__ import annotations

import argparse

import numpy as np

from gaussianmesh_tpu.io import ply as ply_io


def _stats(name: str, arr: np.ndarray) -> str:
    a = np.asarray(arr, np.float64)
    return (f"  {name:16s} shape={tuple(arr.shape)!s:14s} "
            f"min={a.min():+.4g} max={a.max():+.4g} "
            f"mean={a.mean():+.4g} std={a.std():.4g} "
            f"finite={np.isfinite(a).all()}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Inspect / diff Gaussian PLYs")
    ap.add_argument("ply", type=str)
    ap.add_argument("other", type=str, nargs="?", default=None)
    ap.add_argument("--atol", type=float, default=1e-5)
    args = ap.parse_args(argv)

    fields = ply_io.read_ply(args.ply)["vertex"]
    names = list(fields.keys())
    n = fields[names[0]].shape[0]
    is_mesh_bound = "face_id" in names
    kind = "mesh-bound" if is_mesh_bound else "vanilla 3DGS"
    print(f"{args.ply}: {n} gaussians, {len(names)} fields ({kind})")
    groups: dict[str, list[str]] = {}
    for name in names:
        key = name.rstrip("0123456789_xyz") or name
        groups.setdefault(key, []).append(name)
    for key, members in groups.items():
        stacked = np.stack([fields[m] for m in members], axis=-1)
        label = key if len(members) == 1 else f"{key}[{len(members)}]"
        print(_stats(label, stacked))

    if args.other:
        fields2 = ply_io.read_ply(args.other)["vertex"]
        names2 = list(fields2.keys())
        common = [m for m in names if m in set(names2)]
        missing = sorted(set(names) ^ set(names2))
        if missing:
            print(f"fields only in one file: {missing}")
        n2 = fields2[names2[0]].shape[0]
        if n2 != n:
            print(f"COUNT MISMATCH: {n} vs {n2}")
            return
        worst = 0.0
        for m in common:
            d = float(np.abs(np.asarray(fields[m], np.float64)
                             - np.asarray(fields2[m], np.float64)).max())
            worst = max(worst, d)
            flag = "" if d <= args.atol else "   <-- DIFFERS"
            print(f"  {m:16s} max|diff| = {d:.3e}{flag}")
        verdict = "MATCH" if worst <= args.atol else "DIFFER"
        print(f"{verdict} (worst {worst:.3e}, atol {args.atol:g})")


if __name__ == "__main__":
    main()
