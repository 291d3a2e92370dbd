"""Core Gaussian math: quaternions, covariance build/strip, activations.

Semantics match the reference model layer (see
/root/reference/utils/general_utils.py:64-109 and
/root/reference/gaussian_renderer/.../cuda_rasterizer/forward.cu:118-152),
re-derived as batched jnp: quaternion (w, x, y, z) -> rotation matrix,
L = R @ diag(s), world covariance Sigma = L @ L^T, stored as the 6 upper
coefficients (xx, xy, xz, yy, yz, zz).

All functions are vectorized over a leading batch axis and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.log(x / (1.0 - x))


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis`, guarded against zero vectors.

    Matches the reference `jt.normalize` used for quaternions
    (/root/reference/scene/gaussian_model.py:41) for any real input; the
    eps guard keeps dead capacity-padding rows (all-zero quats) finite so
    their zero-cotangent gradients stay zero instead of 0*NaN."""
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps * eps)
    return v / n


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion(s) (..., 4) in (w, x, y, z) order -> rotation matrices (..., 3, 3).

    Does NOT normalize: mirrors the reference kernel behavior
    (forward.cu:127 comments out normalization; the model layer normalizes
    via `get_rotation` before the kernel sees it).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4) (w, x, y, z).

    Branch-free Shepperd-style selection (jit-safe): compute all four
    candidate quaternions and pick the numerically strongest one.
    Used by the edit runtime when converting deformed covariances back to
    (scale, quat) form (reference: edittool/__init__.py:23-38,204-207).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22   # 4w^2
    tx = 1.0 + m00 - m11 - m22   # 4x^2
    ty = 1.0 - m00 + m11 - m22   # 4y^2
    tz = 1.0 - m00 - m11 + m22   # 4z^2

    def _safe_sqrt(t):
        return jnp.sqrt(jnp.maximum(t, 1e-12))

    # candidate from w
    sw = _safe_sqrt(tw)
    qw = jnp.stack([0.5 * sw, 0.5 * (m21 - m12) / sw, 0.5 * (m02 - m20) / sw,
                    0.5 * (m10 - m01) / sw], axis=-1)
    sx = _safe_sqrt(tx)
    qx = jnp.stack([0.5 * (m21 - m12) / sx, 0.5 * sx, 0.5 * (m01 + m10) / sx,
                    0.5 * (m02 + m20) / sx], axis=-1)
    sy = _safe_sqrt(ty)
    qy = jnp.stack([0.5 * (m02 - m20) / sy, 0.5 * (m01 + m10) / sy, 0.5 * sy,
                    0.5 * (m12 + m21) / sy], axis=-1)
    sz = _safe_sqrt(tz)
    qz = jnp.stack([0.5 * (m10 - m01) / sz, 0.5 * (m02 + m20) / sz,
                    0.5 * (m12 + m21) / sz, 0.5 * sz], axis=-1)

    t_all = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(t_all, axis=-1)
    q_all = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(q_all, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    # canonicalize sign (w >= 0)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return normalize(q)


def build_scaling_rotation(s: jax.Array, q: jax.Array) -> jax.Array:
    """L = R @ diag(s), (..., 3, 3). Reference: utils/general_utils.py:100-109."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]  # R @ diag(s) == columns scaled


def build_covariance(scaling: jax.Array, rotation_q: jax.Array,
                     scaling_modifier: float = 1.0) -> jax.Array:
    """World covariance Sigma = L L^T as full (..., 3, 3) symmetric matrices."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation_q)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(sym: jax.Array) -> jax.Array:
    """(..., 3, 3) symmetric -> (..., 6) upper coefficients (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [sym[..., 0, 0], sym[..., 0, 1], sym[..., 0, 2],
         sym[..., 1, 1], sym[..., 1, 2], sym[..., 2, 2]],
        axis=-1,
    )


def unstrip_symmetric(c6: jax.Array) -> jax.Array:
    """(..., 6) upper coefficients -> full symmetric (..., 3, 3)."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def covariance_6(scaling: jax.Array, rotation_q: jax.Array,
                 scaling_modifier: float = 1.0) -> jax.Array:
    """Sigma as (..., 6) uppers — the form the rasterizer consumes."""
    return strip_symmetric(build_covariance(scaling, rotation_q, scaling_modifier))


def inv3x3(A: jax.Array, eps: float = 1e-12) -> tuple[jax.Array, jax.Array]:
    """Closed-form batched 3x3 inverse via the adjugate. -> (inv, det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, 1.0)
    adj = jnp.stack([
        jnp.stack([co00, co01, co02], axis=-1),
        jnp.stack([co10, co11, co12], axis=-1),
        jnp.stack([co20, co21, co22], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None], det


def polar_decompose_rs(A: jax.Array, iters: int = 7) -> tuple[jax.Array, jax.Array]:
    """Polar decomposition A = R S of (..., 3, 3) matrices.

    Higham's scaled Newton iteration X <- 0.5 (s X + (X^-1)^T / s) with
    determinant scaling — pure elementwise 3x3 algebra that runs orders of
    magnitude faster on TPU than batched SVD (XLA's SVD is iterative and
    scalar-heavy), converging quadratically for the well-conditioned
    deformation gradients of the edit hot path. Returns (R, S) with R a
    proper rotation (det +1 for det(A) > 0) and S symmetric; inputs with
    |det| ~ 0 fall back to identity rotation.
    This is the TPU-native replacement for the reference's native ACAP
    GetRS output form (per-vertex deformation-gradient factors;
    SURVEY.md §2.9). Batched over leading axes; safe under jit.
    """
    det_a = jnp.linalg.det(A)
    ok = jnp.abs(det_a) > 1e-9
    safe_a = jnp.where(ok[..., None, None], A, jnp.eye(3, dtype=A.dtype))
    # flip improper maps: newton(A*sign) is the proper rotation R with
    # A = R S (S gains the negative eigenvalue, like the SVD convention)
    sign = jnp.where(det_a < 0, -1.0, 1.0)
    x = safe_a * sign[..., None, None]

    def body(_, x):
        inv, det = inv3x3(x)
        inv_t = jnp.swapaxes(inv, -1, -2)
        # determinant scaling accelerates early iterations
        s = jnp.abs(det) ** (-1.0 / 3.0)
        s = jnp.clip(s, 0.1, 10.0)[..., None, None]
        return 0.5 * (x * s + inv_t / s)

    # unrolled: XLA fuses the short chain better than a fori_loop of
    # tiny batched ops
    r = x
    for i in range(iters):
        r = body(i, r)
    s_mat = jnp.swapaxes(r, -1, -2) @ safe_a
    s_mat = 0.5 * (s_mat + jnp.swapaxes(s_mat, -1, -2))
    return r, s_mat


# ---------------------------------------------------------------------------
# Component-form ("struct of arrays") batched 3x3 algebra.
#
# A batch of 3x3 matrices stored as (..., 3, 3) puts the 3x3 block in the
# TPU's (sublane, lane) minor dims — padded to (8, 128), a ~114x waste —
# and every stack/transpose/matmul on it lowers to layout shuffles. The
# edit hot path (deformation gradients, polar decomposition, covariance
# transforms; SURVEY.md §2.9) instead carries matrices as a tuple of nine
# (...,)-shaped component arrays, row-major (xx, xy, xz, yx, ..., zz):
# every operation below is pure elementwise VPU math over full-width
# vectors. Dense (..., 3, 3) or packed (..., 9) forms exist only at API
# boundaries (gathers want packed rows; tests want dense).
# ---------------------------------------------------------------------------

def m9_from_dense(A: jax.Array):
    """(..., 3, 3) -> 9-tuple of (...,) components, row-major."""
    return tuple(A[..., i, j] for i in range(3) for j in range(3))


def m9_to_dense(m) -> jax.Array:
    """9-tuple -> (..., 3, 3)."""
    rows = [jnp.stack(m[3 * i:3 * i + 3], axis=-1) for i in range(3)]
    return jnp.stack(rows, axis=-2)


def m9_from_packed(p: jax.Array):
    """(..., 9) row-major packed -> 9-tuple."""
    return tuple(p[..., k] for k in range(9))


def m9_to_packed(m) -> jax.Array:
    """9-tuple -> (..., 9) row-major packed (the gather-friendly form)."""
    return jnp.stack(m, axis=-1)


def m9_identity(like: jax.Array):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return (one, zero, zero, zero, one, zero, zero, zero, one)


def m9_t(m):
    xx, xy, xz, yx, yy, yz, zx, zy, zz = m
    return (xx, yx, zx, xy, yy, zy, xz, yz, zz)


def m9_mul(a, b):
    """Component 3x3 matmul: 27 fused multiply-adds on full-width vectors."""
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = a
    b00, b01, b02, b10, b11, b12, b20, b21, b22 = b
    return (
        a00 * b00 + a01 * b10 + a02 * b20,
        a00 * b01 + a01 * b11 + a02 * b21,
        a00 * b02 + a01 * b12 + a02 * b22,
        a10 * b00 + a11 * b10 + a12 * b20,
        a10 * b01 + a11 * b11 + a12 * b21,
        a10 * b02 + a11 * b12 + a12 * b22,
        a20 * b00 + a21 * b10 + a22 * b20,
        a20 * b01 + a21 * b11 + a22 * b21,
        a20 * b02 + a21 * b12 + a22 * b22,
    )


def m9_vec(m, vx, vy, vz):
    """m @ v -> 3-tuple of components."""
    xx, xy, xz, yx, yy, yz, zx, zy, zz = m
    return (xx * vx + xy * vy + xz * vz,
            yx * vx + yy * vy + yz * vz,
            zx * vx + zy * vy + zz * vz)


def m9_det(m):
    xx, xy, xz, yx, yy, yz, zx, zy, zz = m
    return (xx * (yy * zz - yz * zy) - xy * (yx * zz - yz * zx)
            + xz * (yx * zy - yy * zx))


def m9_inv_det(m, eps: float = 1e-12):
    """Adjugate inverse. -> (inv 9-tuple, det)."""
    a, b, c, d, e, f, g, h, i = m
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    r = 1.0 / jnp.where(jnp.abs(det) > eps, det, 1.0)
    return (co00 * r, co01 * r, co02 * r,
            co10 * r, co11 * r, co12 * r,
            co20 * r, co21 * r, co22 * r), det


def m9_scale(m, s):
    return tuple(c * s for c in m)


def polar_rs9(t, iters: int = 7):
    """Component-form polar decomposition T = R S (see polar_decompose_rs
    for the algorithm notes; identical math, SoA layout)."""
    det_t = m9_det(t)
    ok = jnp.abs(det_t) > 1e-9
    ident = m9_identity(det_t)
    safe = tuple(jnp.where(ok, c, ci) for c, ci in zip(t, ident))
    sign = jnp.where(det_t < 0, -1.0, 1.0)
    x = m9_scale(safe, sign)

    for _ in range(iters):
        inv, det = m9_inv_det(x)
        inv_t = m9_t(inv)
        s = jnp.clip(jnp.abs(det) ** (-1.0 / 3.0), 0.1, 10.0)
        x = tuple(0.5 * (xc * s + ic / s) for xc, ic in zip(x, inv_t))

    s_mat = m9_mul(m9_t(x), safe)
    st = m9_t(s_mat)
    s_sym = tuple(0.5 * (a + b) for a, b in zip(s_mat, st))
    return x, s_sym


def sym6_to_m9(c6: jax.Array):
    """(..., 6) uppers (xx,xy,xz,yy,yz,zz) -> symmetric 9-tuple."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return (xx, xy, xz, xy, yy, yz, xz, yz, zz)


def m9_sym6(m) -> jax.Array:
    """9-tuple (assumed symmetric) -> (..., 6) uppers."""
    xx, xy, xz, _, yy, yz, _, _, zz = m
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def congruence_sym6(a, c6: jax.Array) -> jax.Array:
    """A Sigma A^T for symmetric Sigma given as (..., 6) uppers -> (..., 6)."""
    sig = sym6_to_m9(c6)
    return m9_sym6(m9_mul(a, m9_mul(sig, m9_t(a))))
