"""Edit runtime: deformation gradients + barycentric transfer + playback."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianmesh_tpu.edit import pose_paths
from gaussianmesh_tpu.edit.deform import MeshDeformer
from gaussianmesh_tpu.edit.runtime import (ObjectDeformer, SceneEditor,
                                           barycentric_weights)
from gaussianmesh_tpu.io import gaussian_ply, mesh as mesh_io
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.utils import maths
from tests.meshes import icosphere
from tests.scenes import look_at_camera


def _rot(axis, angle):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_deformation_gradients_rigid_and_scale():
    v, f = icosphere(1)
    d = MeshDeformer(v, f)

    Q = _rot([0.3, 1.0, 0.2], 0.7)
    t = np.array([0.5, -0.2, 0.1])
    R, S = d.get_rs(v @ Q.T + t)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(Q, R.shape),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(S), np.broadcast_to(np.eye(3), S.shape),
                               atol=1e-4)

    R2, S2 = d.get_rs(v * 1.7)
    np.testing.assert_allclose(np.asarray(R2), np.broadcast_to(np.eye(3), R2.shape),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(S2),
                               np.broadcast_to(1.7 * np.eye(3), S2.shape),
                               atol=1e-3)


def test_barycentric_weights():
    v1 = jnp.asarray([[0.0, 0, 0]])
    v2 = jnp.asarray([[1.0, 0, 0]])
    v3 = jnp.asarray([[0.0, 1, 0]])
    w = barycentric_weights(jnp.asarray([[1 / 3, 1 / 3, 0.0]]), v1, v2, v3)
    np.testing.assert_allclose(np.asarray(w[0]), [1 / 3, 1 / 3, 1 / 3], atol=1e-5)
    w2 = barycentric_weights(v2, v1, v2, v3)
    np.testing.assert_allclose(np.asarray(w2[0]), [0, 1, 0], atol=1e-5)


def _make_object(tmp_path, seed=0, offset=(0.0, 0.0, 0.0)):
    """Save a procedural mesh-gaussian model + its proxy mesh."""
    v, f = icosphere(1)
    v = v + np.asarray(offset, v.dtype)
    rng = jax.random.PRNGKey(seed)
    p, b, mv, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                       capacity=f.shape[0], vertex_capacity=v.shape[0],
                                       rng=rng)
    p = p.replace(opacity=jnp.full_like(p.opacity, 3.0))
    ply_path = str(tmp_path / "obj.ply")
    mesh_path = str(tmp_path / "mesh.obj")
    gaussian_ply.save_mesh_gaussian_ply(ply_path, p, b)
    mesh_io.write_triangle_mesh(mesh_path, v, f)
    return ply_path, mesh_path, p, b


def test_object_deformer_rigid_motion(tmp_path):
    ply_path, mesh_path, p, b = _make_object(tmp_path)
    obj = ObjectDeformer(ply_path, mesh_path)

    v, f = icosphere(1)
    Q = _rot([0, 1, 0], 0.5)
    t = np.array([0.2, 0.1, -0.3])
    obj.deform(v @ Q.T + t)

    # on-surface gaussians (distance=0 at init) move rigidly
    want = np.asarray(obj.pos0) @ Q.T + t
    np.testing.assert_allclose(np.asarray(obj.pos), want, atol=1e-4)
    # covariance rotates: cov' = Q cov Q^T
    from gaussianmesh_tpu.utils import maths
    cov0_full = np.asarray(maths.unstrip_symmetric(obj.cov6_0))
    want_cov = Q @ cov0_full @ Q.T
    got_cov = np.asarray(maths.unstrip_symmetric(obj.cov6))
    np.testing.assert_allclose(got_cov, want_cov, atol=1e-4)


def test_scene_editor_renders_deformed(tmp_path):
    ply_path, mesh_path, _, _ = _make_object(tmp_path)
    editor = SceneEditor()
    editor.add_object(ply_path, mesh_path, name="obj")
    cfg = RasterizerConfig(width=64, height=64, max_per_tile=128,
                           use_pallas=False)
    cam = look_at_camera(64, 64, distance=3.5)

    out0 = editor.render(cam, cfg)
    img0 = np.asarray(out0.color)
    assert img0.max() > 0.05

    # squash the sphere: image must change but remain finite
    v, f = icosphere(1)
    v2 = v.copy()
    v2[:, 1] *= 0.4
    editor.deform_object("obj", v2)
    out1 = editor.render(cam, cfg)
    img1 = np.asarray(out1.color)
    assert np.isfinite(img1).all()
    assert np.abs(img1 - img0).max() > 0.02


def test_pose_paths():
    cams = pose_paths.ellipse_path(8, np.zeros(3), (3.0, 3.0), 1.0,
                                   1.0, 1.0, 64, 64)
    assert len(cams) == 8
    for c in cams:
        # camera looks at origin: origin projects near image center
        V = c.world_view
        p = V[:3, :3] @ np.zeros(3) + V[:3, 3]
        assert p[2] > 0  # in front
        assert abs(p[0]) < 1e-6 and abs(p[1]) < 1e-6  # centered
    spiral = pose_paths.spiral_path(5, np.zeros(3), 2.0, (0.5, 1.5), 2.0,
                                    1.0, 1.0, 64, 64)
    assert len(spiral) == 5
    sph = pose_paths.spherical_sample_path(5, np.zeros(3), 2.0, 1.0, 1.0, 64, 64)
    assert len(sph) == 5


def test_native_acap_matches_jax():
    from gaussianmesh_tpu.edit.native_acap import NativeACAP, native_available
    if not native_available():
        import pytest as _pytest
        _pytest.skip("no C++ toolchain")
    v, f = icosphere(1)
    Q = _rot([0.2, 0.8, 0.5], 0.6)
    v_def = (v @ Q.T + np.array([0.1, 0.2, 0.3])).astype(np.float32)

    nat = NativeACAP((v, f))
    Rn, Sn = nat.get_rs(v_def, n_threads=2)
    d = MeshDeformer(v, f)
    Rj, Sj = d.get_rs(v_def)
    np.testing.assert_allclose(Rn, np.asarray(Rj), atol=1e-4)
    np.testing.assert_allclose(Sn, np.asarray(Sj), atol=1e-4)
    # reference-style call signature
    R9, S9 = nat.GetRS(v, v_def, 1, 2)
    assert R9.shape == (v.shape[0], 9)


def test_composite_playback_matches_editor_render(tmp_path):
    """make_composite_playback_fn (cached static pair domain) must match
    SceneEditor.render of the same deformed scene."""
    from gaussianmesh_tpu.edit.runtime import make_composite_playback_fn

    ply_a, mesh_a, _, _ = _make_object(tmp_path)
    editor = SceneEditor()
    editor.add_object(ply_a, mesh_a, name="main")
    # second, offset static object (fresh files)
    sub = tmp_path / "b"
    sub.mkdir()
    v, f = icosphere(1)
    ply_b, mesh_b, _, _ = _make_object(sub, offset=(1.4, 0.2, 0.0))
    editor.add_object(ply_b, mesh_b, name="side")

    cfg = RasterizerConfig(width=64, height=64, max_per_tile=256,
                           use_pallas=False)
    cam = look_at_camera(64, 64, distance=3.5)
    cam_arrays = cam if not hasattr(cam, "arrays") else cam

    v2 = v.copy()
    v2[:, 1] *= 0.5
    frame = make_composite_playback_fn(editor, "main", cam_arrays, cfg)
    img_fast = np.asarray(frame(jnp.asarray(v2, jnp.float32)))

    editor.deform_object("main", v2)
    out = editor.render(cam_arrays, cfg, bg_color=jnp.zeros(3))
    np.testing.assert_allclose(img_fast, np.asarray(out.color), atol=3e-5)
