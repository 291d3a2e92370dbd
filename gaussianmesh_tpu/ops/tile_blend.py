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


# -----------------------------------------------------------------------------
# (The earlier flat-grid kernels that required a MATERIALIZED
# chunk-aligned pair buffer were removed: the sorted-domain kernels
# below subsume them with one fewer HBM-sized gather per step.)

NCONTRIB_ROW = 4


# ---------------------------------------------------------------------------
# Sorted-domain blend: the aligned relocation happens INSIDE the kernel.
#
# The aligned pair layout exists only so each 128-wide block belongs to one
# tile; materializing it in HBM costs a p_cap-row gather + transpose
# (~8 ms/frame at 1080p). Instead the kernel reads each block's features
# straight from the SORTED pair buffer: block b of tile t covers sorted
# columns [starts[t] + b*chunk - astarts[t], ...) — contiguous, just not
# 128-aligned. The feature buffer stays in HBM (memory_space=ANY) and the
# kernel streams each misaligned (FEAT, chunk) window itself with a
# double-buffered async DMA: step b starts the fetch for step b+1, then
# waits on its own. The DMA engine handles the unaligned lane offset
# directly, so no roll/realign pass is needed.
#
# (An earlier revision expressed the same reads as TWO auto-pipelined
# 128-aligned views of the buffer with scalar-prefetch-dependent index
# maps + a dynamic lane roll. At 1080p/100K scale, repeated in-program
# invocation of that construct nondeterministically ABORTED the TPU
# backend — isolated to the scalar-index-mapped *input* streams by
# kernel ablation (round-2 log). Manual DMA with in-kernel offset
# computation sidesteps the auto-pipeliner entirely and is the
# load-bearing fix; do not reintroduce scalar-dependent input index
# maps here. Scalar-dependent OUTPUT maps (out8 below) showed no issue.)
#
# The backward walks in reverse with the same reads; its per-block
# gradient writes stay on the ALIGNED domain (disjoint blocks, no
# conflicts) and are mapped back to sorted rows by one inverse gather
# (sorted_shift) — still scatter-free and deterministic.
# ---------------------------------------------------------------------------


def _sorted_alpha_mask(b, chunk, astarts_ref, counts_ref, t):
    """(1, chunk) bool — lanes within tile t's clamped count."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    pos = b * chunk - astarts_ref[t] + lane
    return pos < counts_ref[t]


def _sorted_src0(b, chunk, btile_ref, astarts_ref, starts_ref, m_pad,
                 num_tiles):
    """Sorted-domain start column of aligned block b, clamped so a
    2*chunk-wide aligned DMA stays in bounds (sentinel blocks read pad
    garbage that the live-lane mask zeroes; callers pad the buffer by
    >= 2*chunk columns past the live range)."""
    tc = jnp.clip(btile_ref[b], 0, num_tiles - 1)
    src0 = starts_ref[tc] + b * chunk - astarts_ref[tc]
    return jnp.clip(src0, 0, m_pad - 2 * chunk)


def _window_dma(feat_ref, buf, sem, slot, src0, chunk):
    """Async copy of the two 128-aligned blocks covering the sorted
    window [src0, src0 + chunk) into slot — DMA offsets must respect the
    (8, 128) tiling, so the misaligned extraction happens later with one
    dynamic lane roll (`_window_extract`)."""
    base = (src0 // chunk) * chunk
    return pltpu.make_async_copy(
        feat_ref.at[:, pl.ds(pl.multiple_of(base, chunk), 2 * chunk)],
        buf.at[slot], sem.at[slot])


def _window_extract(buf, slot, src0, chunk):
    """(FEAT, chunk) misaligned window from the fetched aligned pair."""
    off = jax.lax.rem(src0, chunk)
    shifted = pltpu.roll(buf[slot], 2 * chunk - off, axis=1)
    return shifted[:, :chunk]


def _make_sorted_fwd_kernel(grid_x: int, chunk: int, num_tiles: int,
                            m_pad: int, with_contrib: bool):
    def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               out_ref, ckpt_ref, carry, buf, sem):
        b = pl.program_id(0)
        pb = pl.num_programs(0)
        t = btile_ref[b]
        prev_t = jnp.where(b > 0, btile_ref[jnp.maximum(b - 1, 0)], -1)
        next_t = btile_ref[b + 1]

        def src0_of(bb):
            return _sorted_src0(bb, chunk, btile_ref, astarts_ref,
                                starts_ref, m_pad, num_tiles)

        # double-buffered stream: every block fetches unconditionally
        # (sentinels read clamped pad — uniform traffic keeps semaphore
        # bookkeeping trivial: exactly one start + one wait per block)
        @pl.when(b == 0)
        def _prologue():
            _window_dma(feat_ref, buf, sem, 0, src0_of(0), chunk).start()

        @pl.when(b + 1 < pb)
        def _prefetch():
            _window_dma(feat_ref, buf, sem, (b + 1) % 2, src0_of(b + 1),
                        chunk).start()

        _window_dma(feat_ref, buf, sem, b % 2, src0_of(b), chunk).wait()

        @pl.when(t < num_tiles)
        def _valid():
            @pl.when(t != prev_t)
            def _first():
                carry[...] = jnp.ones_like(carry)
                carry[2, :] = jnp.zeros_like(carry[2, :])
                out_ref[...] = jnp.zeros_like(out_ref)

            s_in = carry[0, :]
            ckpt_ref[0, 0, :] = s_in

            def _work():
                tile_x = t % grid_x
                tile_y = t // grid_x
                feat = _window_extract(buf, b % 2, src0_of(b), chunk)
                alpha, _, _, _, _ = _alphas_mxu(feat, tile_x, tile_y)
                live_lane = _sorted_alpha_mask(b, chunk, astarts_ref,
                                               counts_ref, t)
                alpha = jnp.where(live_lane, alpha, 0.0)

                om = 1.0 - alpha
                local_cum = _cumprod_lanes(om)
                s = s_in[:, None] * local_cum
                include = s >= T_EPS
                s_excl = s_in[:, None] * _shift_one_lane(local_cum, 1.0)
                w = alpha * s_excl * include

                rgb3 = feat[ROW_R:ROW_B + 1]           # (3, chunk)
                # (3, PIX) orientation: one out-row accumulate, no
                # lane-strided column slices (see flat kernel note)
                colors3 = jax.lax.dot_general(
                    rgb3, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (3, PIX)
                out_ref[0, 0:3, :] += colors3

                carry[0, :] = s[:, s.shape[1] - 1]
                s_last_inc = jnp.min(jnp.where(include, local_cum, 1.0), axis=1)
                carry[1, :] *= s_last_inc
                if with_contrib:
                    gidx = b * chunk + jax.lax.broadcasted_iota(
                        jnp.int32, (1, chunk), 1)
                    rank = (gidx - astarts_ref[t] + 1).astype(jnp.float32)
                    contributes = include & (alpha > 0.0)
                    carry[2, :] = jnp.maximum(
                        carry[2, :],
                        jnp.max(jnp.where(contributes, rank, 0.0), axis=1))

            pl.when(jnp.max(s_in) >= T_EPS)(_work)

            @pl.when(t != next_t)
            def _last():
                out_ref[0, 3, :] = carry[1, :]
                out_ref[0, NCONTRIB_ROW, :] = carry[2, :]

    return kernel


def _make_sorted_bwd_kernel(grid_x: int, chunk: int, num_tiles: int,
                            m_pad: int):
    def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               g_hbm_ref, ckpt_ref, dpart_ref, qcarry, buf, sem, gbuf,
               gsem):
        pb = pl.num_programs(0)
        b = pb - 1 - pl.program_id(0)                  # reverse walk
        t = btile_ref[b]
        later_t = btile_ref[b + 1]

        def src0_of(bb):
            return _sorted_src0(bb, chunk, btile_ref, astarts_ref,
                                starts_ref, m_pad, num_tiles)

        def g_dma(slot, bb):
            # (1, 8, PIX) pixel-gradient row of block bb's owning tile;
            # sentinel blocks read a clamped row they never use
            tc = jnp.clip(btile_ref[bb], 0, num_tiles - 1)
            return pltpu.make_async_copy(
                g_hbm_ref.at[tc], gbuf.at[slot], gsem.at[slot])

        # reverse-order double-buffered streams (feat window + g row):
        # uniform one-start-one-wait per block, as in the forward
        @pl.when(b == pb - 1)
        def _prologue():
            _window_dma(feat_ref, buf, sem, b % 2, src0_of(b), chunk).start()
            g_dma(b % 2, b).start()

        @pl.when(b > 0)
        def _prefetch():
            _window_dma(feat_ref, buf, sem, (b - 1) % 2, src0_of(b - 1),
                        chunk).start()
            g_dma((b - 1) % 2, b - 1).start()

        _window_dma(feat_ref, buf, sem, b % 2, src0_of(b), chunk).wait()
        g_dma(b % 2, b).wait()
        g_ref = gbuf.at[b % 2]

        @pl.when((t < num_tiles) & (t != later_t))
        def _init_tile():
            qcarry[0, :] = g_ref[3, :] * g_ref[NCONTRIB_ROW, :]

        s_start_pre = ckpt_ref[0, 0, :]
        live_blk = (t < num_tiles) & (jnp.max(s_start_pre) >= T_EPS)

        @pl.when(live_blk)
        def _valid():
            tile_x = t % grid_x
            tile_y = t // grid_x
            feat = _window_extract(buf, b % 2, src0_of(b), chunk)
            alpha, gate, _, raw, _ = _alphas_mxu(feat, tile_x, tile_y)
            live_lane = _sorted_alpha_mask(b, chunk, astarts_ref,
                                           counts_ref, t)
            alpha = jnp.where(live_lane, alpha, 0.0)

            # (PIX, 8) pixel-side gradient stack: rows 0..2 = dL/d color
            g3 = jnp.transpose(g_ref[0:3, :])                # (PIX, 3)
            g8 = jnp.concatenate(
                [g3, jnp.zeros((PIX, _QDIM - 3), jnp.float32)], axis=1)

            s_start = s_start_pre
            om = 1.0 - alpha
            local_cum = _cumprod_lanes(om)
            s = s_start[:, None] * local_cum
            include = s >= T_EPS
            s_excl = s_start[:, None] * _shift_one_lane(local_cum, 1.0)
            w = alpha * s_excl * include

            # dL/dw(p, l) = sum_c g_c(p) rgb_c(l): rank-3 -> one MXU matmul
            rgb8 = jnp.concatenate(
                [feat[ROW_R:ROW_B + 1],
                 jnp.zeros((_QDIM - 3, chunk), jnp.float32)], axis=0)
            dldw = jax.lax.dot_general(
                g8, rgb8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (PIX, chunk)
            a_mat = dldw * w
            chunk_sum = jnp.sum(a_mat, axis=1)
            suffix = chunk_sum[:, None] - _cumsum_lanes(a_mat)
            q = qcarry[0, :][:, None] + suffix
            dalpha = (dldw * s_excl - q / om) * include

            capped = raw > ALPHA_MAX
            live = gate & (~capped) & live_lane
            dalpha = jnp.where(live, dalpha, 0.0)
            dpower = dalpha * alpha

            # All nine per-splat reductions over the 256 pixels ride the
            # MXU: moments of dpower against the pixel monomial basis
            # (tile-local coords, same basis as the forward form) plus the
            # color-gradient contraction against w. The dx/dy polynomials
            # are then recovered per lane from the moments:
            #   sum_p dpower dx      = x R0 - R1   (dx = x - px)
            #   sum_p dpower dx^2    = x^2 R0 - 2 x R1 + R3 , etc.
            # d_op = sum dalpha e = sum dpower / op (alpha = op e on every
            # live lane; both masks zero the rest).
            basis = _pix_basis()                              # (PIX, 8)
            mom = jax.lax.dot_general(
                basis, dpower, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (8, chunk)
            cw = jax.lax.dot_general(
                g8, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (8, chunk)
            _, x, y = _lane_quad(feat, tile_x, tile_y)
            ca, cb, cc = feat[ROW_CA], feat[ROW_CB], feat[ROW_CC]
            r0, r1, r2, r3, r4, r5 = (mom[0], mom[1], mom[2], mom[3],
                                      mom[4], mom[5])
            sdx = x * r0 - r1
            sdy = y * r0 - r2
            op_safe = jnp.maximum(feat[ROW_OP], 1e-12)
            zero = jnp.zeros((chunk,), jnp.float32)
            dpart_ref[...] = jnp.stack([
                -(ca * sdx + cb * sdy),
                -(cc * sdy + cb * sdx),
                -0.5 * (x * x * r0 - 2.0 * x * r1 + r3),
                -(x * y * r0 - x * r2 - y * r1 + r4),
                -0.5 * (y * y * r0 - 2.0 * y * r2 + r5),
                r0 / op_safe,
                cw[0], cw[1], cw[2],
                zero, zero, zero, zero, zero, zero, zero,
            ])

            qcarry[0, :] += chunk_sum

        @pl.when(~live_blk)
        def _pad_block():
            dpart_ref[...] = jnp.zeros_like(dpart_ref)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def blend_sorted_pallas(feat_sortedT: jax.Array, block_tile: jax.Array,
                        aligned_starts: jax.Array, starts: jax.Array,
                        counts: jax.Array, sorted_shift: jax.Array,
                        grid_x: int, num_tiles: int, p_cap: int,
                        chunk: int = 128, with_contrib: bool = False):
    """Flat-grid ragged blend over the SORTED pair buffer.

    feat_sortedT: (FEAT, m_pad) sorted, tile-grouped, depth-ordered pair
        features, padded by at least `chunk` columns past the live range
        (padding may be garbage — it is never unmasked).
    block_tile / aligned_starts / counts: aligned-layout bookkeeping
        (blocks are aligned-domain; reads are sorted-domain).
    starts: (num_tiles + 1,) sorted-domain tile ranges.
    sorted_shift: sorted position -> aligned offset (backward map).
    Returns (color (T, 3, PIX), final_t (T, PIX), n_contrib (T, PIX)).
    """
    out, _ = _sorted_fwd_impl(feat_sortedT, block_tile, aligned_starts,
                              starts, counts, grid_x, num_tiles, p_cap,
                              chunk, with_contrib)
    return out


def _sorted_fwd_impl(feat_sortedT, block_tile, aligned_starts, starts,
                     counts, grid_x, num_tiles, p_cap, chunk,
                     with_contrib=False):
    f_rows, m_pad = feat_sortedT.shape
    assert f_rows == FEAT and m_pad % chunk == 0, (f_rows, m_pad, chunk)
    pb = p_cap // chunk
    kernel = _make_sorted_fwd_kernel(grid_x, chunk, num_tiles, m_pad,
                                     with_contrib)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, 8, PIX),
                         lambda b, btile, *s: (jnp.minimum(btile[b], num_tiles - 1), 0, 0)),
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, FEAT, 2 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out8, ckpt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((pb, 1, PIX), jnp.float32),
        ),
    )(block_tile.astype(jnp.int32), aligned_starts.astype(jnp.int32),
      counts.astype(jnp.int32), starts.astype(jnp.int32), feat_sortedT)

    has = counts > 0
    color = jnp.where(has[:, None, None], out8[:, 0:3], 0.0)
    final_t = jnp.where(has[:, None], out8[:, 3], 1.0)
    n_contrib = jnp.where(has[:, None], out8[:, NCONTRIB_ROW], 0.0)
    return (color, final_t, n_contrib), ckpt


def _sorted_fwd_rule(feat_sortedT, block_tile, aligned_starts, starts,
                     counts, sorted_shift, grid_x, num_tiles, p_cap, chunk,
                     with_contrib=False):
    out, ckpt = _sorted_fwd_impl(feat_sortedT, block_tile, aligned_starts,
                                 starts, counts, grid_x, num_tiles, p_cap,
                                 chunk, with_contrib)
    _, final_t, _ = out
    return out, (feat_sortedT, block_tile, aligned_starts, starts, counts,
                 sorted_shift, ckpt, final_t)


def _sorted_bwd_rule(grid_x, num_tiles, p_cap, chunk, with_contrib, res, cts):
    (feat_sortedT, block_tile, aligned_starts, starts, counts, sorted_shift,
     ckpt, final_t) = res
    g_color, g_final_t, _ = cts
    f_rows, m_pad = feat_sortedT.shape
    pb = p_cap // chunk

    zeros = jnp.zeros_like(final_t)
    g8 = jnp.stack([g_color[:, 0], g_color[:, 1], g_color[:, 2],
                    g_final_t, final_t, zeros, zeros, zeros], axis=1)
    kernel = _make_sorted_bwd_kernel(grid_x, chunk, num_tiles, m_pad)

    def rev(b, *s):
        return (0, pl.num_programs(0) - 1 - b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # feat (streamed by DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # g8 (streamed by DMA)
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (pl.num_programs(0) - 1 - b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((FEAT, chunk), rev),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, FEAT, 2 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 8, PIX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dpartT = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT, p_cap), jnp.float32),
    )(block_tile.astype(jnp.int32), aligned_starts.astype(jnp.int32),
      counts.astype(jnp.int32), starts.astype(jnp.int32), feat_sortedT,
      g8, ckpt)

    # aligned -> sorted: deterministic inverse gather (each live sorted
    # row has a unique aligned position); padding columns get zero
    m = sorted_shift.shape[0]
    dpart = dpartT.T                                     # (p_cap, FEAT)
    d_pad = jnp.concatenate([dpart, jnp.zeros_like(dpart[:1])])
    p_idx = jnp.arange(m, dtype=jnp.int32)
    dest = jnp.clip(p_idx + sorted_shift, 0, p_cap)
    d_sorted = d_pad[dest]                               # (m, FEAT)
    d_featT = jnp.zeros((f_rows, m_pad), dpart.dtype).at[:, :m].set(
        d_sorted.T)
    return (d_featT, None, None, None, None, None)


blend_sorted_pallas.defvjp(_sorted_fwd_rule, _sorted_bwd_rule)
