"""End-to-end: train a mesh-bound model on synthetic views and verify the
loss falls and PSNR reaches a floor (SURVEY.md §4 layer 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
from gaussianmesh_tpu.data.cameras import Camera
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.models import render as render_mod
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.train.trainer import DeviceDataset, MeshTrainer
from tests.meshes import icosphere
from tests.scenes import look_at_camera

W = H = 64


def _cameras(n=12):
    cams = []
    for i in range(n):
        cams.append(look_at_camera(W, H, distance=3.2,
                                   azimuth=2 * np.pi * i / n,
                                   elevation=0.4 * np.sin(i)))
    return cams


def _teacher_images(cams):
    """Ground truth: a colored gaussian-sphere rendered with our renderer."""
    v, f = icosphere(2)  # 320 faces
    p, b, mv, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                       capacity=512, vertex_capacity=2048)
    cent = np.asarray(mgs.get_xyz(p, b))
    # deterministic position-based colors
    cols = (cent / np.abs(cent).max() + 1.0) / 2.0
    from gaussianmesh_tpu.utils import sh as sh_utils
    p = p.replace(
        features_dc=jnp.asarray(sh_utils.rgb_to_sh(cols))[:, None, :].astype(jnp.float32),
        opacity=jnp.full_like(p.opacity, 4.0))  # near-opaque
    cfg = RasterizerConfig(width=W, height=H, max_per_tile=256,
                           use_pallas=False)
    imgs = []
    for cam in cams:
        arrays = render_mod.mesh_model_arrays(p, b, cam, sh_degree=0)
        out = render_mod.render(arrays, cam, cfg, jnp.ones(3))
        imgs.append(np.asarray(jnp.clip(out.color, 0, 1)))
    return imgs


@pytest.mark.slow
def test_train_fits_synthetic_scene():
    cam_arrays = _cameras()
    images = _teacher_images(cam_arrays)

    # wrap into host Camera objects (identity R/T unused — we provide
    # matrices directly via a DeviceDataset built by hand)
    mats = cam_arrays
    ds = DeviceDataset(
        view=jnp.stack([c.viewmatrix for c in mats]),
        proj=jnp.stack([c.projmatrix for c in mats]),
        campos=jnp.stack([c.campos for c in mats]),
        tanfovx=jnp.stack([c.tanfovx for c in mats]),
        tanfovy=jnp.stack([c.tanfovy for c in mats]),
        images=jnp.asarray(np.stack([(i * 255).astype(np.uint8) for i in images])),
        masks=None, width=W, height=H)

    v, f = icosphere(1)  # 80-face proxy for the student
    opt = OptimizationParams(
        densification_interval=60, densify_from_iter=50,
        densify_until_iter=220, opacity_reset_interval=10_000,
        position_lr_max_steps=400)
    rt = RuntimeParams(max_per_tile=256, 
                       use_pallas=False)
    trainer = MeshTrainer(v, f, ds, opt, rt, spatial_lr_scale=3.2,
                          init_target=300, max_sh_degree=1)

    n0 = int(trainer.binding.alive.sum())
    assert n0 > 300  # init subdivision ran past the target
    psnr0 = trainer.eval_psnr(indices=range(3))

    log = trainer.train(iterations=300, log_every=50)
    losses = [m["loss"] for m in log]
    assert losses[-1] < losses[0], losses
    psnr = trainer.eval_psnr(indices=range(3))
    assert psnr > psnr0 + 3.0, (psnr0, psnr)
    assert psnr > 14.0, psnr
    # densification fired
    assert int(trainer.binding.alive.sum()) >= n0
