"""Gaussian model <-> PLY in the reference's interchange schemas.

Mesh-bound schema (scene/mesh_based_gaussian_model.py:290-332): per vertex
  x y z nx ny nz ca cb cc v1x..v3z dis v_index1..3 radius face_id
  f_dc_0..2 f_rest_* opacity scale_0..2 rot_0..3       (all float32)
Vanilla 3DGS schema (scene/gaussian_model.py:221-288): the same without the
attachment block. SH rest coefficients are stored channel-major
(f_rest = transpose(1,2).flatten, i.e. [c, k] order), matching upstream.

Loading reconstructs `bc`/`distance` from the saved logits (ca/cb/cc, dis)
so positions recompute through the attachment law; the saved x/y/z are
kept as `load_xyz` for edit-time use (the deformation runtime caches them,
edittool/__init__.py:49-64).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gaussianmesh_tpu.io import ply as ply_io
from gaussianmesh_tpu.models import gaussians as gs
from gaussianmesh_tpu.models import mesh_gaussians as mgs


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _sh_rest_to_flat(features_rest: np.ndarray) -> dict[str, np.ndarray]:
    # (N, K-1, 3) -> channel-major flat f_rest_i
    cm = np.transpose(features_rest, (0, 2, 1)).reshape(features_rest.shape[0], -1)
    return {f"f_rest_{i}": cm[:, i].astype(np.float32) for i in range(cm.shape[1])}


def sh_degree_from_props(props) -> int:
    k_rest = sum(1 for p in props if p.startswith("f_rest_")) // 3
    deg = int(round((k_rest + 1) ** 0.5)) - 1
    assert (deg + 1) ** 2 - 1 == k_rest, k_rest
    return deg


def _sh_rest_from_props(props, n, max_sh_degree):
    k = (max_sh_degree + 1) ** 2 - 1
    names = sorted((p for p in props if p.startswith("f_rest_")),
                   key=lambda s: int(s.split("_")[-1]))
    assert len(names) == 3 * k, (len(names), k)
    if k == 0:  # degree-0 model: no rest coefficients is a valid schema
        return np.zeros((n, 0, 3), np.float32)
    cm = np.stack([props[p] for p in names], axis=1).reshape(n, 3, k)
    return np.transpose(cm, (0, 2, 1))  # (N, K-1, 3)


def save_mesh_gaussian_ply(path: str, p: mgs.MeshGaussianParams,
                           b: mgs.MeshBinding) -> None:
    alive = np.asarray(b.alive)
    sel = np.nonzero(alive)[0]
    xyz = _np(mgs.get_xyz(p, b))[sel]

    def g(x):
        return _np(x)[sel]

    props: dict[str, np.ndarray] = {}
    for i, n in enumerate("xyz"):
        props[n] = xyz[:, i]
    normal = g(b.normal)
    for i, n in enumerate(("nx", "ny", "nz")):
        props[n] = normal[:, i]
    bc = g(p.bc)
    for i, n in enumerate(("ca", "cb", "cc")):
        props[n] = bc[:, i]
    for vi, vname in enumerate(("v1", "v2", "v3")):
        vv = g((b.vertex1, b.vertex2, b.vertex3)[vi])
        for i, axis in enumerate("xyz"):
            props[f"{vname}{axis}"] = vv[:, i]
    props["dis"] = g(p.distance)[:, 0]
    vidx = g(b.vertex_index)
    for i in range(3):
        props[f"v_index{i + 1}"] = vidx[:, i]
    props["radius"] = g(b.r)[:, 0]
    props["face_id"] = g(b.fid)[:, 0]
    fdc = g(p.features_dc)[:, 0]
    for i in range(3):
        props[f"f_dc_{i}"] = fdc[:, i]
    props.update(_sh_rest_to_flat(g(p.features_rest)))
    props["opacity"] = g(p.opacity)[:, 0]
    scaling = g(p.scaling)
    for i in range(3):
        props[f"scale_{i}"] = scaling[:, i]
    rot = g(p.rotation)
    for i in range(4):
        props[f"rot_{i}"] = rot[:, i]
    ply_io.write_ply(path, {"vertex": props})


def load_mesh_gaussian_ply(path: str, capacity: int | None = None,
                           max_sh_degree: int | None = None):
    """-> (params, binding, load_xyz (N,3) np array of saved positions).
    max_sh_degree=None infers the degree from the stored f_rest count."""
    v = ply_io.read_ply(path)["vertex"]
    n = len(v["x"])
    cap = capacity or n
    if max_sh_degree is None:
        max_sh_degree = sh_degree_from_props(v)

    def cap_pad(x, fill=0.0):
        x = np.asarray(x, np.float32)
        pad = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, pad, constant_values=fill))

    stack = lambda *names: np.stack([v[nm] for nm in names], axis=1)
    k = (max_sh_degree + 1) ** 2

    params = mgs.MeshGaussianParams(
        bc=cap_pad(stack("ca", "cb", "cc")),
        distance=cap_pad(v["dis"][:, None]),
        features_dc=cap_pad(stack("f_dc_0", "f_dc_1", "f_dc_2")[:, None, :]),
        features_rest=cap_pad(_sh_rest_from_props(v, n, max_sh_degree)),
        scaling=cap_pad(stack("scale_0", "scale_1", "scale_2")),
        rotation=cap_pad(stack("rot_0", "rot_1", "rot_2", "rot_3")),
        opacity=cap_pad(v["opacity"][:, None]),
    )
    binding = mgs.MeshBinding(
        vertex1=cap_pad(stack("v1x", "v1y", "v1z")),
        vertex2=cap_pad(stack("v2x", "v2y", "v2z")),
        vertex3=cap_pad(stack("v3x", "v3y", "v3z")),
        vertex_index=jnp.asarray(np.pad(
            np.stack([v[f"v_index{i + 1}"] for i in range(3)], axis=1).astype(np.int32),
            [(0, cap - n), (0, 0)])),
        fid=jnp.asarray(np.pad(v["face_id"].astype(np.int32)[:, None],
                               [(0, cap - n), (0, 0)])),
        normal=cap_pad(stack("nx", "ny", "nz")),
        r=cap_pad(v["radius"][:, None]),
        alive=jnp.asarray(np.arange(cap) < n),
    )
    load_xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    return params, binding, load_xyz


def save_gaussian_ply(path: str, p: gs.GaussianParams, alive) -> None:
    sel = np.nonzero(np.asarray(alive))[0]

    def g(x):
        return _np(x)[sel]

    xyz = g(p.xyz)
    props: dict[str, np.ndarray] = {}
    for i, n in enumerate("xyz"):
        props[n] = xyz[:, i]
    for n in ("nx", "ny", "nz"):
        props[n] = np.zeros(len(sel), np.float32)
    fdc = g(p.features_dc)[:, 0]
    for i in range(3):
        props[f"f_dc_{i}"] = fdc[:, i]
    props.update(_sh_rest_to_flat(g(p.features_rest)))
    props["opacity"] = g(p.opacity)[:, 0]
    scaling = g(p.scaling)
    for i in range(3):
        props[f"scale_{i}"] = scaling[:, i]
    rot = g(p.rotation)
    for i in range(4):
        props[f"rot_{i}"] = rot[:, i]
    ply_io.write_ply(path, {"vertex": props})


def load_gaussian_ply(path: str, capacity: int | None = None,
                      max_sh_degree: int | None = None):
    v = ply_io.read_ply(path)["vertex"]
    n = len(v["x"])
    cap = capacity or n
    if max_sh_degree is None:
        max_sh_degree = sh_degree_from_props(v)

    def cap_pad(x, fill=0.0):
        x = np.asarray(x, np.float32)
        pad = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, pad, constant_values=fill))

    stack = lambda *names: np.stack([v[nm] for nm in names], axis=1)
    params = gs.GaussianParams(
        xyz=cap_pad(stack("x", "y", "z")),
        features_dc=cap_pad(stack("f_dc_0", "f_dc_1", "f_dc_2")[:, None, :]),
        features_rest=cap_pad(_sh_rest_from_props(v, n, max_sh_degree)),
        scaling=cap_pad(stack("scale_0", "scale_1", "scale_2")),
        rotation=cap_pad(stack("rot_0", "rot_1", "rot_2", "rot_3")),
        opacity=cap_pad(v["opacity"][:, None]),
    )
    alive = jnp.asarray(np.arange(cap) < n)
    return params, alive
