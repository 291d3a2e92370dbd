"""Full user pipeline through the CLIs on a synthetic Blender-style dataset:
train_mesh -> render -> metrics -> edit (SURVEY.md §4 layer 5)."""

import json
import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gaussianmesh_tpu.cli import edit as cli_edit
from gaussianmesh_tpu.cli import metrics as cli_metrics
from gaussianmesh_tpu.cli import render as cli_render
from gaussianmesh_tpu.cli import train_mesh as cli_train
from gaussianmesh_tpu.cli.common import save_image
from gaussianmesh_tpu.io import mesh as mesh_io
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.models import render as render_mod
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.utils import sh as sh_utils
from tests.meshes import icosphere

W = H = 64
FOVX = math.radians(50)


def _make_dataset(root, n_cams=10):
    """Blender-style dataset rendered from a teacher sphere."""
    v, f = icosphere(2)
    p, b, _, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                      capacity=512, vertex_capacity=2048)
    cent = np.asarray(mgs.get_xyz(p, b))
    cols = (cent / np.abs(cent).max() + 1.0) / 2.0
    p = p.replace(
        features_dc=jnp.asarray(sh_utils.rgb_to_sh(cols))[:, None, :].astype(jnp.float32),
        opacity=jnp.full_like(p.opacity, 4.0))
    cfg = RasterizerConfig(width=W, height=H, max_per_tile=256,
                           use_pallas=False)

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames = []
    for i in range(n_cams):
        az = 2 * np.pi * i / n_cams
        el = 0.3 * np.sin(i * 1.7)
        dist = 3.2
        pos = dist * np.array([np.cos(el) * np.sin(az), np.sin(el),
                               np.cos(el) * np.cos(az)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], axis=1)   # COLMAP cam-to-world rot
        T = -R.T @ pos

        from gaussianmesh_tpu.data.cameras import Camera
        cam = Camera(uid=i, R=R, T=T, fovx=FOVX, fovy=FOVX,
                     image=np.zeros((3, H, W), np.float32))
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos
        c2w[:3, 1:3] *= -1  # COLMAP -> OpenGL (reader undoes this)
        arrays = render_mod.mesh_model_arrays(p, b, cam.arrays(), 0)
        out = render_mod.render(arrays, cam.arrays(), cfg, jnp.ones(3))
        save_image(os.path.join(root, "train", f"r_{i}.png"), out.color)
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})

    with open(os.path.join(root, "transforms_train.json"), "w") as fjson:
        json.dump({"camera_angle_x": FOVX, "frames": frames}, fjson)
    # eval split reuses train views (tiny fixture)
    with open(os.path.join(root, "transforms_test.json"), "w") as fjson:
        json.dump({"camera_angle_x": FOVX, "frames": frames[:2]}, fjson)

    proxy_v, proxy_f = icosphere(1)
    mesh_path = os.path.join(root, "proxy.obj")
    mesh_io.write_triangle_mesh(mesh_path, proxy_v, proxy_f)
    return mesh_path


@pytest.mark.slow
def test_cli_pipeline(tmp_path):
    data = str(tmp_path / "data")
    model = str(tmp_path / "model")
    os.makedirs(data)
    mesh_path = _make_dataset(data)

    cli_train.main([
        "-s", data, "-m", model, "--input_mesh", mesh_path,
        "--iterations", "120", "--init_target", "300", "--eval",
        "--sh_degree", "1",
        "--densify_from_iter", "40", "--densify_until_iter", "100",
        "--densification_interval", "40",
        "--opacity_reset_interval", "100000",
        "--test_iterations", "120", "--save_iterations", "120",
        "--max_per_tile", "256"])
    ply = os.path.join(model, "point_cloud", "iteration_120",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model, "point_cloud", "iteration_120",
                                       "split_mesh.obj"))
    assert os.path.exists(os.path.join(model, "cameras.json"))
    assert os.path.exists(os.path.join(model, "cfg_args.json"))

    cli_render.main(["-m", model, "--skip_train"])
    renders = os.path.join(model, "test", "ours_120", "renders")
    assert len(os.listdir(renders)) == 2

    cli_metrics.main(["-m", model])
    with open(os.path.join(model, "results.json")) as f:
        res = json.load(f)
    assert res["ours_120"]["PSNR"] > 10.0

    # edit: squash the proxy and play one frame
    v, f = icosphere(1)
    v2 = v.copy()
    v2[:, 1] *= 0.5
    deformed = str(tmp_path / "deformed.obj")
    mesh_io.write_triangle_mesh(deformed, v2, f)
    out_dir = str(tmp_path / "edit_out")
    cli_edit.main(["-m", model, "--gaussian_ply", ply,
                   "--origin_mesh", mesh_path, "--deformed_mesh", deformed,
                   "--out", out_dir, "--max_per_tile", "256"])
    assert len(os.listdir(out_dir)) == 1

    # orbit playback (create_circle_cam analog)
    orbit_dir = str(tmp_path / "edit_orbit")
    cli_edit.main(["-m", model, "--gaussian_ply", ply,
                   "--origin_mesh", mesh_path, "--deformed_mesh", deformed,
                   "--out", orbit_dir, "--orbit", "3",
                   "--max_per_tile", "256"])
    assert len(os.listdir(orbit_dir)) == 3


def test_normalize_roundtrip_and_inspect(tmp_path, capsys):
    """normalize_info -> convert_mesh roundtrip is exact; inspect_ply
    reads and diffs trained artifacts."""
    import json
    from gaussianmesh_tpu.cli import convert_mesh, inspect_ply, normalize_info
    from gaussianmesh_tpu.io import mesh as mesh_io
    from tests.meshes import icosphere
    from tests.test_edit import _make_object

    root = str(tmp_path / "scene")
    _make_dataset(root, n_cams=4)
    tjson = str(tmp_path / "t.json")
    normalize_info.main(["-s", root, "--out", tjson])
    t = json.load(open(tjson))
    M = np.asarray(t["transform_matrix"])
    s = t["scaling_factor"]

    v, f = icosphere(1)
    vn = (v + M[:3, 3]) * s
    recon = str(tmp_path / "recon.obj")
    back = str(tmp_path / "back.obj")
    mesh_io.write_triangle_mesh(recon, vn.astype(np.float32), f)
    convert_mesh.main(["--input", recon, "--output", back,
                       "--transform", tjson])
    vb, _ = mesh_io.read_triangle_mesh(back)
    assert np.abs(vb - v).max() < 1e-5

    ply_path, _, _, _ = _make_object(tmp_path)
    inspect_ply.main([ply_path, ply_path])
    out = capsys.readouterr().out
    assert "mesh-bound" in out and "MATCH" in out


def test_full_eval_wires_up(tmp_path):
    """full_eval parses args and resolves its CLI imports (regression: an
    earlier revision shipped with the import statement truncated)."""
    from gaussianmesh_tpu.cli import full_eval
    full_eval.main(["--base", str(tmp_path), "--scenes", "s1",
                    "--meshes", "m1.obj", "--output",
                    str(tmp_path / "out"), "--skip_training",
                    "--skip_rendering", "--skip_metrics"])
