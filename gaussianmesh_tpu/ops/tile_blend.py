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
  * `blend_tiles_pallas` — Pallas TPU kernels (forward + custom VJP
    backward), chunked over the per-tile Gaussian list flash-attention
    style with carried transmittance in scratch, early-exit when the whole
    tile is saturated, and per-chunk transmittance checkpoints so the
    backward re-derives exp factors without a reverse sweep dependency.

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


def _pixel_coords(tile_x, tile_y):
    """Pixel centers of a tile as two (PIX, 1) columns (row-major in-tile)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tile_x * TILE + p % TILE).astype(jnp.float32)
    py = (tile_y * TILE + p // TILE).astype(jnp.float32)
    return px, py


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
    raw = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, raw)
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(gate, alpha, 0.0)
    return alpha, gate, power, raw, dx, dy


def _tile_fwd_math(feat, tile_x, tile_y):
    """One tile, full list. feat (FEAT, K). Returns (out8 (8, PIX))."""
    px, py = _pixel_coords(tile_x, tile_y)
    alpha, gate, _, _, _, _ = _alphas(feat, px, py)
    real = feat[ROW_REAL][None, :] > 0.0

    log_om = jnp.log1p(-alpha)
    cum = jnp.cumsum(log_om, axis=1)
    include = cum >= LOG_T_EPS
    s_excl = jnp.exp(cum - log_om)
    w = alpha * s_excl * include

    r = jnp.sum(w * feat[ROW_R][None, :], axis=1)
    g = jnp.sum(w * feat[ROW_G][None, :], axis=1)
    b = jnp.sum(w * feat[ROW_B][None, :], axis=1)
    final_t = jnp.exp(jnp.sum(jnp.where(include, log_om, 0.0), axis=1))
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


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _make_fwd_kernel(grid_x: int, kc_size: int):
    """Forward: grid (num_tiles, NC); feat block (1, FEAT, KC); out (1, 8, PIX).

    Scratch carry rows: 0=log_S (all alphas), 1=log_T (included only),
    2=n_contrib. Persist across the chunk axis; re-initialized per tile.
    """
    def kernel(feat_ref, out_ref, ckpt_ref, carry):
        t = pl.program_id(0)
        kc = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(kc == 0)
        def _init():
            carry[...] = jnp.zeros_like(carry)
            out_ref[...] = jnp.zeros_like(out_ref)

        # checkpoint log_S at chunk start (for the backward recompute)
        ckpt_ref[0, pl.ds(kc, 1), :] = carry[0, :][None, :]

        log_s_in = carry[0, :]                     # (PIX,)
        # early-exit: whole tile saturated -> only bookkeeping
        live = jnp.max(log_s_in) >= LOG_T_EPS

        @pl.when(live)
        def _work():
            tile_x = t % grid_x
            tile_y = t // grid_x
            feat = feat_ref[0]                     # (FEAT, KC)
            px, py = _pixel_coords(tile_x, tile_y)
            alpha, _, _, _, _, _ = _alphas(feat, px, py)
            real = feat[ROW_REAL][None, :] > 0.0

            log_om = jnp.log1p(-alpha)             # (PIX, KC)
            local_cum = _cumsum_lanes(log_om)
            log_s = log_s_in[:, None] + local_cum  # inclusive, global
            include = log_s >= LOG_T_EPS
            s_excl = jnp.exp(log_s - log_om)
            w = alpha * s_excl * include

            out_ref[0, 0, :] += jnp.sum(w * feat[ROW_R][None, :], axis=1)
            out_ref[0, 1, :] += jnp.sum(w * feat[ROW_G][None, :], axis=1)
            out_ref[0, 2, :] += jnp.sum(w * feat[ROW_B][None, :], axis=1)

            carry[0, :] = log_s[:, log_s.shape[1] - 1]
            carry[1, :] += jnp.sum(jnp.where(include, log_om, 0.0), axis=1)
            rank = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1) + 1 + kc * kc_size
            contributes = include & (alpha > 0.0) & real
            carry[2, :] = jnp.maximum(
                carry[2, :], jnp.max(jnp.where(contributes, rank, 0), axis=1).astype(jnp.float32))

        @pl.when(kc == nc - 1)
        def _finalize():
            out_ref[0, 3, :] = jnp.exp(carry[1, :])
            out_ref[0, 4, :] = carry[2, :]

    return kernel


def _make_bwd_kernel(grid_x: int, kc_size: int):
    """Reverse sweep over chunks: grid (num_tiles, NC), kc counts backwards."""
    def kernel(feat_ref, ckpt_ref, g_ref, dfeat_ref, qcarry):
        t = pl.program_id(0)
        first = pl.program_id(1) == 0  # first step of the reverse sweep

        tile_x = t % grid_x
        tile_y = t // grid_x
        feat = feat_ref[0]                          # (FEAT, KC)
        px, py = _pixel_coords(tile_x, tile_y)
        alpha, gate, power, raw, dx, dy = _alphas(feat, px, py)

        g_r = g_ref[0, 0, :][:, None]               # (PIX, 1)
        g_g = g_ref[0, 1, :][:, None]
        g_b = g_ref[0, 2, :][:, None]
        g_t = g_ref[0, 3, :]                        # (PIX,) cotangent of final_t
        t_final = g_ref[0, 4, :]                    # stashed final_t (residual)

        @pl.when(first)
        def _init():
            qcarry[0, :] = g_t * t_final

        nc = pl.num_programs(1)
        kc = nc - 1 - pl.program_id(1)              # actual chunk index
        log_s_start = ckpt_ref[0, kc, :]            # (PIX,)
        log_om = jnp.log1p(-alpha)
        local_cum = _cumsum_lanes(log_om)
        log_s = log_s_start[:, None] + local_cum
        include = log_s >= LOG_T_EPS
        s_excl = jnp.exp(log_s - log_om)
        w = alpha * s_excl * include

        dldw = (g_r * feat[ROW_R][None, :] + g_g * feat[ROW_G][None, :]
                + g_b * feat[ROW_B][None, :])       # (PIX, KC)
        a_mat = dldw * w
        # suffix over j>k within chunk + carried right-side total
        chunk_sum = jnp.sum(a_mat, axis=1)
        suffix = chunk_sum[:, None] - _cumsum_lanes(a_mat)
        q = qcarry[0, :][:, None] + suffix
        one_m = 1.0 - alpha
        dalpha = (dldw * s_excl - q / one_m) * include

        # alpha gates: capped (raw > max) kills the local grad
        capped = raw > ALPHA_MAX
        dalpha = jnp.where(gate & (~capped), dalpha, 0.0)
        exp_power = jnp.exp(power)
        dop_elem = dalpha * exp_power
        dpower = dalpha * alpha

        dca = jnp.sum(dpower * (-0.5 * dx * dx), axis=0)
        dcb = jnp.sum(dpower * (-dx * dy), axis=0)
        dcc = jnp.sum(dpower * (-0.5 * dy * dy), axis=0)
        ddx = dpower * (-(feat[ROW_CA][None, :] * dx + feat[ROW_CB][None, :] * dy))
        ddy = dpower * (-(feat[ROW_CC][None, :] * dy + feat[ROW_CB][None, :] * dx))

        zero = jnp.zeros((feat.shape[1],), feat.dtype)
        dfeat_ref[0] = jnp.stack([
            jnp.sum(ddx, axis=0),
            jnp.sum(ddy, axis=0),
            dca, dcb, dcc,
            jnp.sum(dop_elem, axis=0),
            jnp.sum(g_r * w, axis=0),
            jnp.sum(g_g * w, axis=0),
            jnp.sum(g_b * w, axis=0),
            zero, zero, zero, zero, zero, zero, zero,
        ])

        qcarry[0, :] += chunk_sum

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def blend_tiles_pallas(tile_feats: jax.Array, grid_x: int, chunk: int = 128):
    out, _ = _blend_fwd_impl(tile_feats, grid_x, chunk)
    return out


def _blend_fwd_impl(tile_feats, grid_x: int, chunk: int):
    num_tiles, feat_rows, k = tile_feats.shape
    assert feat_rows == FEAT and k % chunk == 0, (feat_rows, k, chunk)
    nc = k // chunk
    kernel = _make_fwd_kernel(grid_x, chunk)
    out8, ckpt = pl.pallas_call(
        kernel,
        grid=(num_tiles, nc),
        in_specs=[pl.BlockSpec((1, FEAT, chunk), lambda t, c: (t, 0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 8, PIX), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, PIX), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, nc, PIX), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32)],
    )(tile_feats)
    color, final_t, n_contrib = out8[:, 0:3], out8[:, 3], out8[:, 4]
    return (color, final_t, n_contrib), ckpt


def _blend_fwd_rule(tile_feats, grid_x: int, chunk: int):
    (color, final_t, n_contrib), ckpt = _blend_fwd_impl(tile_feats, grid_x, chunk)
    return (color, final_t, n_contrib), (tile_feats, ckpt, final_t)


def _blend_bwd_rule(grid_x: int, chunk: int, res, cts):
    tile_feats, ckpt, final_t = res
    g_color, g_final_t, _ = cts
    num_tiles, _, k = tile_feats.shape
    nc = k // chunk
    # pack cotangents + final_t residual into one (T, 8, PIX) block
    zeros = jnp.zeros_like(final_t)
    g8 = jnp.stack([g_color[:, 0], g_color[:, 1], g_color[:, 2],
                    g_final_t, final_t, zeros, zeros, zeros], axis=1)
    kernel = _make_bwd_kernel(grid_x, chunk)
    dfeat = pl.pallas_call(
        kernel,
        grid=(num_tiles, nc),
        in_specs=[
            pl.BlockSpec((1, FEAT, chunk), lambda t, c: (t, 0, nc - 1 - c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, PIX), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PIX), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FEAT, chunk), lambda t, c: (t, 0, nc - 1 - c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, FEAT, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32)],
    )(tile_feats, ckpt, g8)
    return (dfeat,)


blend_tiles_pallas.defvjp(_blend_fwd_rule, _blend_bwd_rule)
