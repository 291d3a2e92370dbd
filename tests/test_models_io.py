import numpy as np
import jax
import jax.numpy as jnp

from gaussianmesh_tpu.io import gaussian_ply, mesh as mesh_io, ply as ply_io
from gaussianmesh_tpu.models import gaussians as gs
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.models import render as render_mod
from gaussianmesh_tpu.ops.knn import mean_sq_dist3
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from tests.meshes import icosphere
from tests.scenes import look_at_camera


def test_knn_exact():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32))
    got = np.asarray(mean_sq_dist3(pts, row_chunk=128))
    d2 = np.sum((np.asarray(pts)[:, None] - np.asarray(pts)[None]) ** 2, -1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mesh_model_position_law():
    v, f = icosphere(1)
    p, b, mv, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                       capacity=128, vertex_capacity=256)
    n = f.shape[0]
    xyz = np.asarray(mgs.get_xyz(p, b))[:n]
    # bc = uniform, distance = 0 -> xyz == face centroids
    cent = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3
    np.testing.assert_allclose(xyz, cent, atol=1e-5)
    # push distance: offset = alpha*r*(sigmoid-0.5)*normal
    p2 = p.replace(distance=jnp.full_like(p.distance, 10.0))  # sigmoid ~ 1
    xyz2 = np.asarray(mgs.get_xyz(p2, b))[:n]
    offs = np.linalg.norm(xyz2 - cent, axis=1)
    r = np.asarray(b.r)[:n, 0]
    np.testing.assert_allclose(offs, 4.0 * r * (1 / (1 + np.exp(-10.0)) - 0.5),
                               rtol=1e-4)


def test_mesh_model_renders():
    v, f = icosphere(1)
    p, b, mv, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                       capacity=128, vertex_capacity=256)
    cam = look_at_camera(64, 64, distance=3.5)
    arrays = render_mod.mesh_model_arrays(p, b, cam, sh_degree=0)
    cfg = RasterizerConfig(width=64, height=64, max_per_tile=128,
                           use_pallas=False)
    out = render_mod.render(arrays, cam, cfg, jnp.zeros(3))
    img = np.asarray(out.color)
    assert img.max() > 0.05  # something rendered
    assert int(out.visibility.sum()) > 0


def test_mesh_ply_roundtrip(tmp_path):
    v, f = icosphere(0)
    rng = jax.random.PRNGKey(1)
    p, b, mv, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                       capacity=64, vertex_capacity=64, rng=rng)
    # randomize a bit so roundtrip is meaningful
    p = p.replace(bc=p.bc + 0.1, distance=p.distance + 0.3,
                  features_rest=p.features_rest + 0.01)
    path = str(tmp_path / "model.ply")
    gaussian_ply.save_mesh_gaussian_ply(path, p, b)
    p2, b2, load_xyz = gaussian_ply.load_mesh_gaussian_ply(path, capacity=64)

    n = f.shape[0]
    for name in ("bc", "distance", "features_dc", "features_rest",
                 "scaling", "rotation", "opacity"):
        np.testing.assert_allclose(np.asarray(getattr(p, name))[:n],
                                   np.asarray(getattr(p2, name))[:n],
                                   atol=1e-6, err_msg=name)
    for name in ("vertex1", "vertex2", "vertex3", "normal", "r"):
        np.testing.assert_allclose(np.asarray(getattr(b, name))[:n],
                                   np.asarray(getattr(b2, name))[:n],
                                   atol=1e-6, err_msg=name)
    np.testing.assert_array_equal(np.asarray(b.fid)[:n], np.asarray(b2.fid)[:n])
    # saved xyz equals the position law output
    np.testing.assert_allclose(load_xyz, np.asarray(mgs.get_xyz(p, b))[:n],
                               atol=1e-6)


def test_vanilla_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (50, 3)).astype(np.float32))
    p, st = gs.create_from_points(pts, cols, capacity=64)
    path = str(tmp_path / "bg.ply")
    gaussian_ply.save_gaussian_ply(path, p, st.alive)
    p2, alive2 = gaussian_ply.load_gaussian_ply(path, capacity=64)
    assert int(alive2.sum()) == 50
    for name in ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity"):
        np.testing.assert_allclose(np.asarray(getattr(p, name))[:50],
                                   np.asarray(getattr(p2, name))[:50],
                                   atol=1e-6, err_msg=name)


def test_mesh_io_roundtrip(tmp_path):
    v, f = icosphere(0)
    for ext in ("obj", "ply"):
        path = str(tmp_path / f"m.{ext}")
        mesh_io.write_triangle_mesh(path, v, f)
        v2, f2 = mesh_io.read_triangle_mesh(path)
        np.testing.assert_allclose(v2, v, atol=1e-5)
        np.testing.assert_array_equal(f2, f)


def test_mesh_ply_header_matches_reference_schema(tmp_path):
    """Golden byte-level header check against the REFERENCE field order
    (scene/mesh_based_gaussian_model.py:290-302 construct_list_of_attributes):
    a reference-trained ply and a repo-trained ply must be mutually loadable
    field-for-field, so the exact property ORDER (not just the set) is the
    interop contract. sh_degree=3 -> 45 f_rest channels, channel-major."""
    v, f = icosphere(0)
    p, b, _, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                      capacity=f.shape[0],
                                      vertex_capacity=4 * v.shape[0],
                                      max_sh_degree=3)
    path = str(tmp_path / "golden.ply")
    gaussian_ply.save_mesh_gaussian_ply(path, p, b)

    expected = (["x", "y", "z", "nx", "ny", "nz", "ca", "cb", "cc",
                 "v1x", "v1y", "v1z", "v2x", "v2y", "v2z",
                 "v3x", "v3y", "v3z", "dis",
                 "v_index1", "v_index2", "v_index3", "radius", "face_id"]
                + [f"f_dc_{i}" for i in range(3)]
                + [f"f_rest_{i}" for i in range(45)]
                + ["opacity"]
                + [f"scale_{i}" for i in range(3)]
                + [f"rot_{i}" for i in range(4)])
    with open(path, "rb") as fh:
        header = fh.read(8192).split(b"end_header")[0].decode("ascii")
    lines = [ln.strip() for ln in header.splitlines()]
    assert any(ln.startswith("element vertex") for ln in lines)
    got = [ln.split()[-1] for ln in lines if ln.startswith("property")]
    assert got == expected, (got, expected)
    # every property is float32, as the reference writes ('f4')
    types = {ln.split()[1] for ln in lines if ln.startswith("property")}
    assert types == {"float"}, types


def test_vanilla_ply_header_matches_reference_schema(tmp_path):
    """Same golden check for the background model schema
    (scene/gaussian_model.py:221-236): the mesh schema minus the
    attachment block."""
    pts = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
    cols = np.full((7, 3), 0.5, np.float32)
    p, st = gs.create_from_points(jnp.asarray(pts), jnp.asarray(cols),
                                  capacity=7, max_sh_degree=3)
    path = str(tmp_path / "golden_bg.ply")
    gaussian_ply.save_gaussian_ply(path, p, st.alive)

    expected = (["x", "y", "z", "nx", "ny", "nz"]
                + [f"f_dc_{i}" for i in range(3)]
                + [f"f_rest_{i}" for i in range(45)]
                + ["opacity"]
                + [f"scale_{i}" for i in range(3)]
                + [f"rot_{i}" for i in range(4)])
    with open(path, "rb") as fh:
        header = fh.read(8192).split(b"end_header")[0].decode("ascii")
    lines = [ln.strip() for ln in header.splitlines()]
    got = [ln.split()[-1] for ln in lines if ln.startswith("property")]
    assert got == expected, (got, expected)
