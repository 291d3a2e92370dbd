"""Per-Gaussian preprocessing: projection, EWA 2D covariance, culling.

Fully-vectorized jnp replacement for the reference preprocess kernel
(/root/reference/gaussian_renderer/.../cuda_rasterizer/forward.cu:156-256):
one fused elementwise pipeline over all N Gaussians that XLA maps onto the
VPU, with gradients supplied by autodiff (the reference hand-writes them in
backward.cu:144-396).

Behavioral parity notes:
- near cull: view-space z <= 0.2 (auxiliary.h:153)
- projection: p_ndc = (P_full @ [x,1]).xyz / (w + 1e-7)
- EWA: t.x/t.y clamped to ±1.3·tanfov·t.z; cov2d = A V Σ Vᵀ Aᵀ + 0.3·I
  with A the 2x3 perspective Jacobian (forward.cu:74-113)
- conic = inverse(cov2d); cull if det == 0
- radius = ceil(3·sqrt(max eigenvalue)), eigenvalue floor 0.1
- tile rect from `getRect` (auxiliary.h:45-56); cull if empty
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.utils.graphics import ndc_to_pix

TILE = 16  # BLOCK_X = BLOCK_Y = 16 (config.h:16-17)
NEAR_Z = 0.2


class CameraArrays(NamedTuple):
    """Device-side camera parameters (all jnp arrays; H/W passed statically)."""
    viewmatrix: jax.Array   # (4, 4) world -> view
    projmatrix: jax.Array   # (4, 4) full projection = P @ V
    campos: jax.Array       # (3,)
    tanfovx: jax.Array      # ()
    tanfovy: jax.Array      # ()


class Preprocessed(NamedTuple):
    valid: jax.Array         # (N,) bool — survives all culls
    mean2d: jax.Array        # (N, 2) pixel coordinates
    depth: jax.Array         # (N,) view-space z
    conic: jax.Array         # (N, 3) inverse 2D covariance (a, b, c)
    radius: jax.Array        # (N,) int32 screen radius (0 when culled)
    rect_min: jax.Array      # (N, 2) int32 tile rect (x, y)
    rect_max: jax.Array      # (N, 2) int32 tile rect (x, y), exclusive
    tiles_touched: jax.Array # (N,) int32


def tile_grid(width: int, height: int) -> tuple[int, int]:
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


def preprocess(means3d: jax.Array, cov6: jax.Array, cam: CameraArrays,
               width: int, height: int,
               opacity: jax.Array | None = None) -> Preprocessed:
    """Project N Gaussians; compute conics, radii and tile rects.

    When `opacity` is given, tile rects use the Gaussian's GATED footprint
    instead of the reference's 3-sigma circle: the blend kernel zeroes any
    pixel with alpha = op*exp(-q/2) < 1/255 (forward.cu:330-345), so only
    the ellipse {q <= 2 ln(255 op)} can contribute. Its axis-aligned bbox
    half-extents are sqrt(qcut * Sigma2d_xx/yy) — exact, per-axis, and
    opacity-aware — intersected with the reference circle so the enqueued
    pair set stays a subset of the reference's (output-identical; typically
    2-4x fewer pairs). `radius` itself keeps the reference formula (it
    feeds visibility and densification stats).
    """
    V = cam.viewmatrix
    grid_x, grid_y = tile_grid(width, height)

    # view + clip transforms
    t = means3d @ V[:3, :3].T + V[:3, 3]                    # (N, 3) view space
    p_hom = means3d @ cam.projmatrix[:3, :4][:, :3].T + cam.projmatrix[:3, 3]
    w_hom = means3d @ cam.projmatrix[3, :3] + cam.projmatrix[3, 3]
    p_w = 1.0 / (w_hom + 1e-7)
    p_proj = p_hom * p_w[:, None]                           # (N, 3) NDC

    in_front = t[:, 2] > NEAR_Z

    # EWA Jacobian with fov clamping (forward.cu:82-92)
    fx = width / (2.0 * cam.tanfovx)
    fy = height / (2.0 * cam.tanfovy)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tz = jnp.where(in_front, t[:, 2], 1.0)  # avoid div-by-0 on culled points
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    # A = [[fx/tz, 0, -fx tx / tz^2], [0, fy/tz, -fy ty / tz^2]]
    inv_tz = 1.0 / tz
    a00 = fx * inv_tz
    a02 = -fx * tx * inv_tz * inv_tz
    a11 = fy * inv_tz
    a12 = -fy * ty * inv_tz * inv_tz

    # M = A @ V_rot  (2x3 per Gaussian, expanded elementwise)
    R = V[:3, :3]
    m0 = a00[:, None] * R[0] + a02[:, None] * R[2]          # (N, 3)
    m1 = a11[:, None] * R[1] + a12[:, None] * R[2]          # (N, 3)

    # Sigma as full sym from 6 uppers, contracted: cov2d = M Σ Mᵀ
    xx, xy, xz, yy, yz, zz = (cov6[:, i] for i in range(6))

    def quad(u, v):
        # u Σ vᵀ for row vectors u, v of shape (N, 3)
        return (u[:, 0] * (xx * v[:, 0] + xy * v[:, 1] + xz * v[:, 2])
                + u[:, 1] * (xy * v[:, 0] + yy * v[:, 1] + yz * v[:, 2])
                + u[:, 2] * (xz * v[:, 0] + yz * v[:, 1] + zz * v[:, 2]))

    c_a = quad(m0, m0) + 0.3
    c_b = quad(m0, m1)
    c_c = quad(m1, m1) + 0.3

    det = c_a * c_c - c_b * c_b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c_c * inv_det, -c_b * inv_det, c_a * inv_det], axis=-1)

    # screen extent (forward.cu:229-237)
    mid = 0.5 * (c_a + c_c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    radius = jax.lax.stop_gradient(radius_f).astype(jnp.int32)

    px = ndc_to_pix(p_proj[:, 0], width)
    py = ndc_to_pix(p_proj[:, 1], height)
    mean2d = jnp.stack([px, py], axis=-1)

    px_s = jax.lax.stop_gradient(px)
    py_s = jax.lax.stop_gradient(py)
    radius_f32 = radius.astype(jnp.float32)
    if opacity is not None:
        op_s = jax.lax.stop_gradient(opacity).reshape(-1)
        qcut = 2.0 * jnp.log(jnp.maximum(op_s, 1e-12) * 255.0)
        qpos = jnp.maximum(qcut, 0.0)
        # c_a/c_c are the 2D covariance diagonal (incl. the 0.3 low-pass);
        # +0.5px covers pixel-center vs bbox-edge rounding
        hx = jnp.minimum(radius_f32,
                         jnp.sqrt(qpos * jax.lax.stop_gradient(c_a)) + 0.5)
        hy = jnp.minimum(radius_f32,
                         jnp.sqrt(qpos * jax.lax.stop_gradient(c_c)) + 0.5)
        gated = qcut > 0.0
    else:
        hx = hy = radius_f32
        gated = True
    rmin_x = jnp.clip(jnp.floor((px_s - hx) / TILE), 0, grid_x).astype(jnp.int32)
    rmin_y = jnp.clip(jnp.floor((py_s - hy) / TILE), 0, grid_y).astype(jnp.int32)
    rmax_x = jnp.clip(jnp.floor((px_s + hx) / TILE) + 1, 0, grid_x).astype(jnp.int32)
    rmax_y = jnp.clip(jnp.floor((py_s + hy) / TILE) + 1, 0, grid_y).astype(jnp.int32)
    tiles_touched = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    finite = jnp.isfinite(px_s) & jnp.isfinite(py_s) & jnp.isfinite(det_safe)
    valid = in_front & det_ok & (tiles_touched > 0) & finite & gated
    radius = jnp.where(valid, radius, 0)
    tiles_touched = jnp.where(valid, tiles_touched, 0).astype(jnp.int32)

    # Sanitize culled rows: their values are never blended (alpha gated to
    # zero) but non-finite forward values would turn zero cotangents into
    # NaN during backprop (0 * inf). Unit conic keeps the power finite.
    mean2d = jnp.where(valid[:, None], mean2d, 0.0)
    conic = jnp.where(valid[:, None], conic,
                      jnp.array([1.0, 0.0, 1.0], conic.dtype))

    return Preprocessed(
        valid=valid,
        mean2d=mean2d,
        depth=jnp.where(valid, t[:, 2], 0.0),
        conic=conic,
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=tiles_touched,
    )
