"""Real spherical harmonics evaluation (degrees 0..3), matmul-formulated.

Behavioral parity with the reference SH path
(/root/reference/gaussian_renderer/.../cuda_rasterizer/forward.cu:20-71 and
/root/reference/utils/sh_utils.py:57-118): same basis constants, same sign
conventions, final `+ 0.5` offset and clamp-at-zero applied by the caller.

TPU-first formulation: instead of a per-coefficient scalar chain, build the
basis matrix B (N, 16) once and contract against SH coefficients
(N, 16, 3) — a batched reduction XLA maps onto the MXU/VPU cleanly, and
whose VJP (d/d sh and d/d dir) is generated automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)

MAX_COEFFS = 16  # degree 3


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """DC color <- RGB. Reference: utils/sh_utils.py:114."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    return sh * C0 + 0.5


def _sh_basis_cols(dirs: jax.Array, degree: int) -> list[jax.Array]:
    """SH basis columns for unit directions (..., 3) as a LIST of (...,)
    arrays. Sign convention follows the reference kernel exactly
    (forward.cu:30-59): b1 = (-y, +z, -x) * C1, etc."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    cols = [C0 * one]
    if degree >= 1:
        cols += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        cols += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    return cols


def sh_basis(dirs: jax.Array, degree: int) -> jax.Array:
    """SH basis values for unit directions (..., 3) -> (..., (degree+1)**2)."""
    return jnp.stack(_sh_basis_cols(dirs, degree), axis=-1)


def eval_sh(sh: jax.Array, dirs: jax.Array, degree: int) -> jax.Array:
    """Evaluate SH -> raw color (before +0.5 offset).

    sh:   (..., K, 3) coefficients with K >= (degree+1)**2
    dirs: (..., 3) unit view directions

    Formulated as an unrolled chain of elementwise multiply-adds over
    full-width (...,) vectors rather than a batched (k, 3)-dim einsum:
    contracting tiny minor dims puts a (16, 3) block in the TPU's
    (sublane, lane) tile — padded to (16, 128) — and the batched matmul
    XLA emits for it runs ~5x slower than this flat form.
    """
    cols = _sh_basis_cols(dirs, degree)
    out = []
    for c in range(3):
        acc = cols[0] * sh[..., 0, c]
        for i in range(1, len(cols)):
            acc = acc + cols[i] * sh[..., i, c]
        out.append(acc)
    return jnp.stack(out, axis=-1)


def eval_sh_color(sh: jax.Array, means: jax.Array, campos: jax.Array,
                  degree: int) -> tuple[jax.Array, jax.Array]:
    """Full reference color path: normalize(mean - campos), eval, +0.5, clamp.

    Returns (rgb, clamped_mask). Gradient flows through the direction
    normalization to `means` exactly as the reference backward does via
    dnormvdv (backward.cu:20-139) — here supplied by autodiff.
    """
    d = means - campos
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    raw = eval_sh(sh, d, degree) + 0.5
    clamped = raw < 0.0
    return jnp.maximum(raw, 0.0), clamped
