"""Per-tile alpha blending — the rasterizer hot loop, TPU-first.

The reference implements this as a per-pixel sequential front-to-back loop
with shared-memory staging and, in the backward, a back-to-front re-walk
with atomicAdd scatter (forward.cu:261-374, backward.cu:399-557). On TPU we
exploit that alpha compositing is associative: per pixel

    log_S_k = sum_{j<=k} log(1 - alpha_j)          (ALL candidates)
    include_k = exp(log_S_k) >= 1e-4               (prefix property)
    w_k   = alpha_k * exp(log_S_{k-1}) * include_k
    color = sum_k w_k * rgb_k ,  final_T = prod_{included}(1 - alpha_k)

which is exactly the sequential semantics (certified against a literal
scan transcription in tests/test_oracle.py) but runs as vectorized VPU math
+ reductions, deterministic, with no atomics.

Two implementations with identical math:
  * `blend_tiles_jnp` — pure jnp vmap/lax.map over tiles; runs anywhere
    (CPU tests), differentiable by autodiff. The oracle for the kernel.
  * `blend_sorted_pallas` — Pallas TPU kernels (forward + custom VJP
    backward) streaming the compacted, tile-grouped pair buffer in
    chunk-aligned blocks, flash-attention style: carried transmittance in
    scratch, early exit when the whole tile is saturated, per-tile chunk
    skipping driven by scalar-prefetched ranges, and per-chunk
    transmittance checkpoints so the backward re-derives exp factors
    without a reverse-sweep data dependency.

Gradient-semantics note: gradients through `min(0.99, alpha)` are masked
when the cap is active (the mathematically consistent choice); the
reference backward leaks d alpha/d opacity = exp(power) even when capped
(backward.cu:477-545). Differences only arise for near-opaque splats.

Feature-row layout (F=16): 0=x, 1=y, 2..4=conic(a,b,c), 5=opacity,
6..8=rgb, 9=real-entry flag, 10..15 padding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PIX = TILE * TILE          # 256 pixels per tile
FEAT = 16                  # feature rows (padded to sublane multiple)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
LOG_T_EPS = math.log(T_EPS)

ROW_X, ROW_Y, ROW_CA, ROW_CB, ROW_CC, ROW_OP = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_REAL = 6, 7, 8, 9


def pack_features(mean2d, conic, opacity, rgb, valid) -> jax.Array:
    """(N, ...) attributes -> (N + 1, FEAT) table; last row is the dummy."""
    n = mean2d.shape[0]
    feat = jnp.zeros((n + 1, FEAT), mean2d.dtype)
    feat = feat.at[:n, ROW_X].set(mean2d[:, 0])
    feat = feat.at[:n, ROW_Y].set(mean2d[:, 1])
    feat = feat.at[:n, ROW_CA:ROW_CC + 1].set(conic)
    feat = feat.at[:n, ROW_OP].set(jnp.where(valid, opacity, 0.0))
    feat = feat.at[:n, ROW_R:ROW_B + 1].set(rgb)
    feat = feat.at[:n, ROW_REAL].set(valid.astype(mean2d.dtype))
    return feat


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along axis 1 (lanes) via log-step shift-adds.

    Mosaic has no native cumsum; a Hillis–Steele scan in log2(K) VPU adds
    is cheap for K <= 512 and lowers cleanly (static slices only).
    """
    k = x.shape[1]
    d = 1
    while d < k:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:, :d]), x[:, :k - d]], axis=1)
        x = x + shifted
        d *= 2
    return x


def _cumprod_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumprod along lanes — same log-step scan with multiplies.

    Multiplicative transmittance tracking is both cheaper (no log1p/exp
    pair) and closer to the reference's sequential `T *= (1 - alpha)`
    (forward.cu:346-357) than the log-space form."""
    k = x.shape[1]
    d = 1
    while d < k:
        shifted = jnp.concatenate(
            [jnp.ones_like(x[:, :d]), x[:, :k - d]], axis=1)
        x = x * shifted
        d *= 2
    return x


def _shift_one_lane(x: jax.Array, fill: float) -> jax.Array:
    """Shift right by one lane, filling with `fill` (exclusive-scan helper)."""
    return jnp.concatenate(
        [jnp.full_like(x[:, :1], fill), x[:, :x.shape[1] - 1]], axis=1)


def _pixel_coords(tile_x, tile_y):
    """Pixel centers of a tile as two (PIX, 1) columns (row-major in-tile)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tile_x * TILE + p % TILE).astype(jnp.float32)
    py = (tile_y * TILE + p // TILE).astype(jnp.float32)
    return px, py


# ---------------------------------------------------------------------------
# MXU bilinear form: power(p, l) = -q(p, l)/2 is a rank-6 bilinear form in
# the pixel monomials [1, px, py, px^2, px*py, py^2] and per-splat conic
# coefficients, so the (PIX, chunk) power matrix is ONE (256, 8) x (8, 128)
# MXU matmul instead of ~11 VPU ops per element. All coordinates are
# TILE-LOCAL (px in [0, 16); lane means shifted by the tile origin), which
# bounds every expansion term by the quadratic form over the tile
# neighborhood — no large-coordinate cancellation (at global 1080p coords
# the px^2-scale terms would eat ~5 of f32's 7 digits).
# ---------------------------------------------------------------------------

_QDIM = 8  # rank-6 basis padded to 8 for sublane alignment


def _pix_basis() -> jax.Array:
    """Constant (PIX, 8) tile-local pixel monomial basis."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (p % TILE).astype(jnp.float32)
    py = (p // TILE).astype(jnp.float32)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, zero, zero], axis=1)


def _lane_quad(feat, tile_x, tile_y):
    """Per-lane quadratic coefficients Q (8, chunk) + tile-local means.

    power = P @ Q with P the pixel basis:
      q0 = -(ca x^2 + cc y^2)/2 - cb x y   (x, y tile-local lane means)
      q1 = ca x + cb y ,  q2 = cb x + cc y
      q3 = -ca/2 ,  q4 = -cb ,  q5 = -cc/2
    """
    x = feat[ROW_X] - (tile_x * TILE).astype(jnp.float32)   # (chunk,)
    y = feat[ROW_Y] - (tile_y * TILE).astype(jnp.float32)
    ca, cb, cc = feat[ROW_CA], feat[ROW_CB], feat[ROW_CC]
    q0 = -0.5 * (ca * x * x + cc * y * y) - cb * x * y
    q1 = ca * x + cb * y
    q2 = cb * x + cc * y
    zero = jnp.zeros_like(x)
    q = jnp.stack([q0, q1, q2, -0.5 * ca, -cb, -0.5 * cc, zero, zero])
    return q, x, y


def _alphas_mxu(feat, tile_x, tile_y):
    """Gated alphas for one tile via the MXU bilinear form.

    feat (FEAT, chunk) -> (alpha, gate, e, raw, power), each (PIX, chunk).
    Same math as `_alphas` up to matmul rounding.
    """
    q, _, _ = _lane_quad(feat, tile_x, tile_y)
    power = jax.lax.dot_general(
        _pix_basis(), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (PIX, chunk)
    op = feat[ROW_OP][None, :]
    e = jnp.exp(power)
    raw = op * e
    alpha = jnp.minimum(ALPHA_MAX, raw)
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(gate, alpha, 0.0)
    return alpha, gate, e, raw, power


def _alphas(feat, px, py):
    """Gated alphas for one tile: feat (FEAT, K) -> alpha (PIX, K) + aux."""
    x = feat[ROW_X][None, :]
    y = feat[ROW_Y][None, :]
    ca = feat[ROW_CA][None, :]
    cb = feat[ROW_CB][None, :]
    cc = feat[ROW_CC][None, :]
    op = feat[ROW_OP][None, :]
    dx = x - px
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    e = jnp.exp(power)
    raw = op * e
    alpha = jnp.minimum(ALPHA_MAX, raw)
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(gate, alpha, 0.0)
    return alpha, gate, e, raw, dx, dy


def _tile_fwd_math(feat, tile_x, tile_y):
    """One tile, full list. feat (FEAT, K). Returns (out8 (8, PIX))."""
    px, py = _pixel_coords(tile_x, tile_y)
    alpha, gate, _, _, _, _ = _alphas(feat, px, py)
    real = feat[ROW_REAL][None, :] > 0.0

    om = 1.0 - alpha
    cum = jnp.cumprod(om, axis=1)
    include = cum >= T_EPS
    s_excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
    w = alpha * s_excl * include

    r = jnp.sum(w * feat[ROW_R][None, :], axis=1)
    g = jnp.sum(w * feat[ROW_G][None, :], axis=1)
    b = jnp.sum(w * feat[ROW_B][None, :], axis=1)
    final_t = jnp.prod(jnp.where(include, om, 1.0), axis=1)
    k = feat.shape[1]
    rank = jax.lax.broadcasted_iota(jnp.int32, (PIX, k), 1) + 1
    contributes = include & (alpha > 0.0) & real
    n_contrib = jnp.max(jnp.where(contributes, rank, 0), axis=1).astype(jnp.float32)
    return jnp.stack([r, g, b, final_t, n_contrib,
                      jnp.zeros_like(r), jnp.zeros_like(r), jnp.zeros_like(r)])


def blend_tiles_jnp(tile_feats: jax.Array, grid_x: int,
                    tile_chunk: int = 64) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-jnp blend. tile_feats (T, FEAT, K) -> (color (T,3,PIX), final_t, n_contrib)."""
    num_tiles = tile_feats.shape[0]
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    pad = (-num_tiles) % tile_chunk
    feats_p = jnp.pad(tile_feats, ((0, pad), (0, 0), (0, 0)))
    tids_p = jnp.pad(tids, (0, pad))

    def chunk_fn(args):
        f, t = args
        return jax.vmap(lambda fi, ti: _tile_fwd_math(fi, ti % grid_x, ti // grid_x))(f, t)

    out = jax.lax.map(chunk_fn, (feats_p.reshape(-1, tile_chunk, FEAT, feats_p.shape[-1]),
                                 tids_p.reshape(-1, tile_chunk)))
    out = out.reshape(-1, 8, PIX)[:num_tiles]
    return out[:, 0:3], out[:, 3], out[:, 4]

