"""Camera matrices and projection helpers.

Conventions (chosen to be clean jnp; behaviorally equivalent to the
reference's transposed-row-major buffers):

- `world_to_view(R, t)` builds V with x_view = V[:3,:3] @ x_world + V[:3,3],
  where (R, t) follow the COLMAP/3DGS convention: R is the cam-to-world
  rotation, t the world-to-cam translation
  (reference: utils/graphics_utils.py:31-49).
- `projection_matrix` matches reference getProjectionMatrix
  (utils/graphics_utils.py:51-71): after P @ x_view, w' = z_view, and
  ndc = clip/(w + 1e-7).
- `ndc_to_pix(v, S) = ((v + 1) * S - 1) / 2` (auxiliary.h:40-43).

We store matrices in natural math orientation (apply as M @ x). The
reference stores them transposed for its row-vector convention; parity
tests account for that.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world->view matrix; optional scene recentering like getWorld2View2."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    # skip the double 4x4 inversion when recentering is a no-op (the
    # common case: callers pass a zeros default)
    if (translate is not None and np.any(translate)) or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc_to_pix(v: jax.Array, size: int) -> jax.Array:
    """auxiliary.h:40-43 — pixel-center convention of the reference."""
    return ((v + 1.0) * size - 1.0) * 0.5


def transform_points_h(points: jax.Array, M: jax.Array) -> jax.Array:
    """Apply 4x4 `M` to (N, 3) points, returning homogeneous (N, 4)."""
    return points @ M[:3, :3].T + M[:3, 3] if M.shape[0] == 3 else (
        jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1) @ M.T
    )


def camera_center_from_w2v(V: np.ndarray) -> np.ndarray:
    """Camera position in world space from the 4x4 world->view matrix."""
    return np.linalg.inv(V)[:3, 3].astype(np.float32)
