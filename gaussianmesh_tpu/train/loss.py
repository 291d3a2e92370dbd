"""Training losses: L1, SSIM, mesh-restrict; eval PSNR.

Parity targets: /root/reference/utils/loss_utils.py (l1_loss:17, ssim:36-81
with an 11x11 sigma-1.5 Gaussian window, C1=0.01^2, C2=0.03^2) and
mesh_restrict_loss (:86-107): sum(clamp(max(scale) - w*sqrt(||ABxAC||), 0))
tying each Gaussian's largest axis to its face size (weight = alpha_mrloss,
default 6 — arguments/__init__.py:91). Total training loss
(train_mesh_gaussian.py:92-94): (1-l)*L1 + l*(1-SSIM) + mrloss, l = 0.2.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def l1_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return ((pred - gt) ** 2).mean()


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-image PSNR over flattened pixels (utils/image_utils.py:21-23)."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> tuple:
    g = [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
         for x in range(window_size)]
    s = sum(g)
    return tuple(v / s for v in g)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """SSIM on (C, H, W) or (B, C, H, W) images, reference-equivalent.

    The 2D window is separable — implemented as two 1D grouped convs
    (cheaper on TPU than the reference's dense 11x11 conv)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    c = img1.shape[1]
    w1d = jnp.asarray(_gaussian_window(window_size, 1.5), img1.dtype)

    kx = jnp.tile(w1d[None, None, None, :], (c, 1, 1, 1))   # (C,1,1,W)
    ky = jnp.tile(w1d[None, None, :, None], (c, 1, 1, 1))   # (C,1,W,1)
    pad = window_size // 2

    def blur(x):
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), [(0, 0), (pad, pad)], feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jax.lax.conv_general_dilated(
            x, ky, (1, 1), [(pad, pad), (0, 0)], feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = blur(img1 * img1) - mu1_sq
    sigma2 = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu12

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2))
    return ssim_map.mean()


def mesh_restrict_loss(scaling: jax.Array, v1: jax.Array, v2: jax.Array,
                       v3: jax.Array, alive: jax.Array,
                       weight: float = 6.0) -> jax.Array:
    """sum over alive of clamp(max_axis_scale - weight*sqrt(2*area), 0)."""
    max_s = jnp.max(scaling, axis=1)
    cross = jnp.cross(v2 - v1, v3 - v1)
    r = jnp.sqrt(jnp.linalg.norm(cross, axis=1))
    return jnp.sum(jnp.where(alive, jnp.clip(max_s - weight * r, 0.0, None), 0.0))


def photometric_loss(pred: jax.Array, gt: jax.Array,
                     lambda_dssim: float = 0.2) -> jax.Array:
    return ((1.0 - lambda_dssim) * l1_loss(pred, gt)
            + lambda_dssim * (1.0 - ssim(pred, gt)))
