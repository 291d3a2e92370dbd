"""Random synthetic scenes + cameras for tests and benchmarks."""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from gaussianmesh_tpu.ops.preprocess import CameraArrays
from gaussianmesh_tpu.utils import graphics, maths


def look_at_camera(width: int, height: int, fovx_deg: float = 60.0,
                   distance: float = 4.0, azimuth: float = 0.3,
                   elevation: float = 0.2) -> CameraArrays:
    """Camera orbiting the origin, reference matrix conventions."""
    fovx = math.radians(fovx_deg)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, width), height)

    cam_pos = distance * np.array([
        math.cos(elevation) * math.sin(azimuth),
        math.sin(elevation),
        math.cos(elevation) * math.cos(azimuth),
    ])
    fwd = -cam_pos / np.linalg.norm(cam_pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    # R: cam-to-world rotation (columns = camera axes in world frame)
    R = np.stack([right, up2, fwd], axis=1)
    t = -R.T @ cam_pos  # world-to-cam translation

    V = graphics.world_to_view(R, t)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    return CameraArrays(
        viewmatrix=jnp.asarray(V),
        projmatrix=jnp.asarray(P @ V),
        campos=jnp.asarray(cam_pos, dtype=jnp.float32),
        tanfovx=jnp.float32(math.tan(fovx / 2)),
        tanfovy=jnp.float32(math.tan(fovy / 2)),
    )


def random_gaussians(n: int, seed: int = 0, spread: float = 1.0,
                     scale_range=(0.02, 0.12), opacity_range=(0.2, 0.95)):
    """Random cloud near the origin. Returns dict of jnp arrays."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacity = rng.uniform(*opacity_range, (n,)).astype(np.float32)
    rgb = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)

    cov6 = maths.covariance_6(jnp.asarray(scales), jnp.asarray(quats))
    return dict(
        means3d=jnp.asarray(means),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        cov6=cov6,
        opacity=jnp.asarray(opacity),
        rgb=jnp.asarray(rgb),
    )
