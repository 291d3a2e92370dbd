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
# Sorted-domain blend v2: half-granular alignment, two tiles per block.
#
# The aligned pair layout exists only so each compute block belongs to
# known tiles; v1 aligned every tile's range to the full 128-lane chunk,
# wasting 44% of lanes at 1080p/100K (avg ~108 pairs/tile). v2 aligns to
# HALF a chunk (64): each 128-lane grid step processes two independent
# 64-lane halves, each owned by (possibly different) tiles — per-lane
# tile origins let both halves share one (PIX, chunk) alpha/gate
# evaluation; only the transmittance scans (which must reset at the
# half boundary) and the color/gradient matmuls split per half. Lane
# waste drops to <= 63 per tile (~25%), and the half-split scans are
# CHEAPER than one full scan (2 x 6 half-width steps vs 7 full).
#
# The feature buffer stays in HBM (memory_space=ANY); the kernel streams
# each half's misaligned sorted-domain window itself with double-buffered
# async DMA (one aligned chunk-wide fetch + a dynamic lane roll), and the
# backward streams the two owning tiles' pixel-gradient rows the same
# way.
#
# (An earlier revision expressed these reads as auto-pipelined views
# with scalar-prefetch-dependent index maps. At 1080p/100K scale,
# repeated in-program invocation of that construct nondeterministically
# ABORTED the TPU backend — isolated to the scalar-index-mapped *input*
# streams by kernel ablation (round-2 log). Manual DMA with in-kernel
# offset computation sidesteps the auto-pipeliner and is the
# load-bearing fix; do not reintroduce scalar-dependent input index
# maps here. Scalar-dependent OUTPUT maps showed no issue, and the two
# per-half outputs below rely on that: a tile's halves alternate between
# the even-half and odd-half output arrays, which are summed after the
# call (rows never visited stay zero via input_output_aliases on zero
# inputs).
#
# The backward walks in reverse with the same reads; its per-block
# gradient writes stay on the ALIGNED domain (disjoint blocks, no
# conflicts) and are mapped back to sorted rows by one inverse gather
# (sorted_shift) — still scatter-free and deterministic. Per-half
# transmittance checkpoints from the forward remove any reverse-sweep
# data dependency.
# ---------------------------------------------------------------------------


def _half_src0(h, half, ht_ref, astarts_ref, starts_ref, m_pad, num_tiles):
    """Sorted-domain start column of aligned half h, clamped so the
    2-chunk-wide aligned fetch stays in bounds (sentinel halves read pad
    garbage that the live-lane mask zeroes; callers pad the buffer by
    >= 2 chunks past the live range)."""
    tc = jnp.clip(ht_ref[h], 0, num_tiles - 1)
    src0 = starts_ref[tc] + h * half - astarts_ref[tc]
    return jnp.clip(src0, 0, m_pad - 4 * half)


def _half_dma(feat_ref, buf, sem, slot, hi, src0, half):
    """Async copy of the two CHUNK-aligned blocks covering the sorted
    window [src0, src0 + half) into (slot, hi) — DMA offsets must be
    multiples of the (8, 128) lane tiling, so the fetch is 2*chunk wide
    at a chunk-aligned base and the misaligned extraction happens later
    with one dynamic lane roll (`_half_extract`)."""
    chunk = 2 * half
    base = (src0 // chunk) * chunk
    return pltpu.make_async_copy(
        feat_ref.at[:, pl.ds(pl.multiple_of(base, chunk), 2 * chunk)],
        buf.at[slot, hi], sem.at[slot, hi])


def _half_extract(buf, slot, hi, src0, half):
    """(FEAT, half) misaligned window from the fetched aligned pair."""
    off = jax.lax.rem(src0, 2 * half)
    shifted = pltpu.roll(buf[slot, hi], 4 * half - off, axis=1)
    return shifted[:, :half]



_DEAD_Q0 = -1e30  # exp(power) == 0 exactly for dead lanes

# q-table rows (FEAT=16). Everything the kernels need per SORTED pair,
# precomputed on the XLA side fused with the table gather
# (build_qtable): rows 0..5 are the tile-local quadratic form (power =
# Q · pixel monomials), with opacity and the live mask FOLDED INTO q0
# (q0 += log op; dead lanes -1e30 so raw == 0 exactly); 6..8 are rgb.
# The custom-VJP boundary sits AT this table: the backward kernel
# returns dL/dq rows + dL/drgb directly (the MXU moment matrix), and
# XLA autodiff chains q -> (mean2d, conic, opacity) elementwise —
# no in-kernel gradient reconstruction, no per-lane tile bookkeeping.
ROW_Q0, ROW_Q1, ROW_Q2, ROW_Q3, ROW_Q4, ROW_Q5 = 0, 1, 2, 3, 4, 5
# rgb occupies rows 6..8 == ROW_R..ROW_B (shared with the flat layout)


def build_qtable(feat_sorted: jax.Array, sorted_tile: jax.Array,
                 live: jax.Array, grid_x: int) -> jax.Array:
    """(m, FEAT) pack_features-layout rows (already gathered to the
    sorted pair domain) + per-pair owning tile + live mask -> (m, FEAT)
    q-table. Differentiable in feat_sorted; tile ids and the mask are
    static routing (stop-gradient by construction).

    Semantics note: the reference's `power > 0 -> skip` guard
    (forward.cu:330-335) is dropped here. power > 0 can only arise from
    rounding near the ellipse center where alpha ~= op either way, and
    the ALPHA_MAX cap bounds the result; the jnp oracle keeps the guard
    and the parity suites bound the difference.
    """
    tl = jax.lax.stop_gradient(sorted_tile)
    ox = ((tl % grid_x) * TILE).astype(jnp.float32)
    oy = ((tl // grid_x) * TILE).astype(jnp.float32)
    x = feat_sorted[:, ROW_X] - ox
    y = feat_sorted[:, ROW_Y] - oy
    ca = feat_sorted[:, ROW_CA]
    cb = feat_sorted[:, ROW_CB]
    cc = feat_sorted[:, ROW_CC]
    live = live & (feat_sorted[:, ROW_REAL] > 0.0)
    log_op = jnp.log(jnp.maximum(feat_sorted[:, ROW_OP], 1e-30))
    q0 = -0.5 * (ca * x * x + cc * y * y) - cb * x * y + log_op
    q0 = jnp.where(live, q0, _DEAD_Q0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [q0, ca * x + cb * y, cb * x + cc * y,
         -0.5 * ca, -cb, -0.5 * cc,
         feat_sorted[:, ROW_R], feat_sorted[:, ROW_G], feat_sorted[:, ROW_B],
         zero, zero, zero, zero, zero, zero, zero], axis=-1)


def _raw_alphas_T(qwin):
    """Raw alphas TRANSPOSED — pairs on SUBLANES, pixels on lanes.

    qwin (FEAT, chunk) q-table window -> raw (chunk, PIX). One MXU
    contraction of the 8-dim basis axis: rows 6..8 (rgb) ride along but
    multiply the basis' zero pad rows, so contracting rows 0..7 only
    (a free sublane slice) gives exactly power = Q . monomials. raw ==
    op * exp(power) with zero extra vector work (opacity and the live
    mask are folded into q0), and raw == 0.0 exactly on dead lanes. The
    transposed orientation comes straight out of the MXU — no
    transposes anywhere — and makes the half-chunk granularity FREE:
    sublane slices at multiples of 8 are tile-aligned, unlike sub-128
    lane slices which waste full vector slots (measured 2x regression,
    round-2 log).
    """
    power_t = jax.lax.dot_general(
        qwin[:_QDIM], _pix_basis(), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (chunk, PIX)
    return jnp.exp(power_t)


def _shift_one_sublane(x, fill):
    """Shift down by one sublane, filling row 0 with `fill`."""
    return jnp.concatenate(
        [jnp.full_like(x[:1], fill), x[:-1]], axis=0)


def _cumprod_sublanes(x):
    """Inclusive cumprod down the sublane axis (log-step scan)."""
    k = x.shape[0]
    d = 1
    while d < k:
        x = x * jnp.concatenate([jnp.ones_like(x[:d]), x[:k - d]], axis=0)
        d *= 2
    return x


def _cumsum_sublanes(x):
    """Inclusive cumsum down the sublane axis (log-step scan)."""
    k = x.shape[0]
    d = 1
    while d < k:
        x = x + jnp.concatenate([jnp.zeros_like(x[:d]), x[:k - d]], axis=0)
        d *= 2
    return x


def _window_mask(h0, half, ht_ref, astarts_ref, counts_ref, num_tiles):
    """(chunk, 1) sublane mask: lane i of half h is live iff its sorted
    position is within the owning tile's granted count. A granule's
    64-wide sorted window OVERRUNS into the next tile's pairs (their own
    q0 is live — liveness is positional, not per-pair), so this mask is
    load-bearing: without it the tail lanes double-blend the next tile's
    splats into the wrong tile."""
    def rem(h):
        tc = jnp.clip(ht_ref[h], 0, num_tiles - 1)
        r = counts_ref[tc] - (h * half - astarts_ref[tc])
        return jnp.where(ht_ref[h] < num_tiles, r, 0)

    pos = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
    return jnp.concatenate([pos < rem(h0), pos < rem(h0 + 1)], axis=0)


def _make_sorted_fwd_kernel(grid_x: int, chunk: int, num_tiles: int,
                            m_pad: int, with_contrib: bool):
    half = chunk // 2

    def kernel(ht_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               zA_ref, zB_ref, outA_ref, outB_ref, ckpt_ref, carry, buf,
               sem):
        b = pl.program_id(0)
        pb = pl.num_programs(0)
        h0 = 2 * b
        t0 = ht_ref[h0]
        t1 = ht_ref[h0 + 1]
        prev_t = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 1, 0)], -1)
        prev_even = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 2, 0)], -1)
        next_t = ht_ref[h0 + 2]

        def src0_of(h):
            return _half_src0(h, half, ht_ref, astarts_ref, starts_ref,
                              m_pad, num_tiles)

        # double-buffered stream; sentinel halves skip their fetch (the
        # start and the wait are guarded by the SAME scalar condition,
        # so semaphore bookkeeping stays consistent: block_tile is
        # nondecreasing, so a sentinel t0 implies sentinel t1 and
        # sentinel everything after)
        @pl.when((b == 0) & (t0 < num_tiles))
        def _prologue():
            _half_dma(feat_ref, buf, sem, 0, 0, src0_of(0), half).start()
            _half_dma(feat_ref, buf, sem, 0, 1, src0_of(1), half).start()

        @pl.when((b + 1 < pb) & (ht_ref[h0 + 2] < num_tiles))
        def _prefetch():
            nslot = (b + 1) % 2
            _half_dma(feat_ref, buf, sem, nslot, 0, src0_of(h0 + 2),
                      half).start()
            _half_dma(feat_ref, buf, sem, nslot, 1, src0_of(h0 + 3),
                      half).start()

        slot = b % 2

        # capacity blocks past the live range: no fetch, no math, no write
        @pl.when(t0 < num_tiles)
        def _live_block():
            _half_dma(feat_ref, buf, sem, slot, 0, src0_of(h0), half).wait()
            _half_dma(feat_ref, buf, sem, slot, 1, src0_of(h0 + 1),
                      half).wait()
            # first visit of each output row: zero it (rows never visited
            # keep the aliased zero input)
            @pl.when((t0 != prev_even) & (t0 < num_tiles))
            def _initA():
                outA_ref[...] = jnp.zeros_like(outA_ref)

            @pl.when((t1 != prev_t) & (t1 < num_tiles))
            def _initB():
                outB_ref[...] = jnp.zeros_like(outB_ref)

            # ---- both halves in one MXU contraction ----
            featw = jnp.concatenate(
                [_half_extract(buf, slot, 0, src0_of(h0), half),
                 _half_extract(buf, slot, 1, src0_of(h0 + 1), half)], axis=1)

            # TRANSPOSED domain from here: pairs on sublanes, pixels on lanes
            raw_t = _raw_alphas_T(featw)                      # (chunk, PIX)
            wmask = _window_mask(h0, half, ht_ref, astarts_ref, counts_ref,
                                 num_tiles)
            alpha_t = jnp.where((raw_t >= ALPHA_MIN) & wmask,
                                jnp.minimum(raw_t, ALPHA_MAX), 0.0)

            # ---- per-half transmittance chains (sublane scans; sublane
            # slices at multiples of 8 are tile-aligned and cost-free) ----
            s_prev = carry[0, :]
            sA_in = jnp.where(t0 != prev_t, jnp.ones_like(s_prev), s_prev)
            ckpt_ref[0, 0, :] = sA_in

            omA = 1.0 - alpha_t[:half]
            cumA = _cumprod_sublanes(omA)
            sA = sA_in[None, :] * cumA
            inclA = sA >= T_EPS
            wA = alpha_t[:half] * (sA_in[None, :]
                                   * _shift_one_sublane(cumA, 1.0)) * inclA
            sA_end = sA[half - 1]

            sB_in = jnp.where(t1 != t0, jnp.ones_like(sA_end), sA_end)
            ckpt_ref[0, 1, :] = sB_in

            omB = 1.0 - alpha_t[half:]
            cumB = _cumprod_sublanes(omB)
            sB = sB_in[None, :] * cumB
            inclB = sB >= T_EPS
            wB = alpha_t[half:] * (sB_in[None, :]
                                   * _shift_one_sublane(cumB, 1.0)) * inclB
            carry[0, :] = sB[half - 1]

            # ---- per-half color accumulation ----
            @pl.when(t0 < num_tiles)
            def _accumA():
                colors = jax.lax.dot_general(
                    featw[ROW_R:ROW_B + 1, :half], wA, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (3, PIX)
                outA_ref[0, 0:3, :] += colors

            @pl.when(t1 < num_tiles)
            def _accumB():
                colors = jax.lax.dot_general(
                    featw[ROW_R:ROW_B + 1, half:], wB, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outB_ref[0, 0:3, :] += colors

            # ---- final_t / n_contrib bookkeeping ----
            ftA_reset = jnp.where(t0 != prev_t, jnp.ones_like(s_prev),
                                  carry[1, :])
            ftA = ftA_reset * jnp.min(jnp.where(inclA, cumA, 1.0), axis=0)
            if with_contrib:
                t0c = jnp.clip(t0, 0, num_tiles - 1)
                ncA_reset = jnp.where(t0 != prev_t, jnp.zeros_like(s_prev),
                                      carry[2, :])
                rankA = (jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
                         + (h0 * half - astarts_ref[t0c]) + 1
                         ).astype(jnp.float32)
                ncA = jnp.maximum(ncA_reset, jnp.max(
                    jnp.where(inclA & (alpha_t[:half] > 0.0), rankA, 0.0),
                    axis=0))
            else:
                ncA = jnp.zeros_like(s_prev)

            @pl.when((t1 != t0) & (t0 < num_tiles))
            def _closeA():
                outA_ref[0, 3, :] = ftA
                outA_ref[0, NCONTRIB_ROW, :] = ncA

            ftB_reset = jnp.where(t1 != t0, jnp.ones_like(s_prev), ftA)
            ftB = ftB_reset * jnp.min(jnp.where(inclB, cumB, 1.0), axis=0)
            carry[1, :] = ftB
            if with_contrib:
                t1c = jnp.clip(t1, 0, num_tiles - 1)
                ncB_reset = jnp.where(t1 != t0, jnp.zeros_like(s_prev), ncA)
                rankB = (jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
                         + ((h0 + 1) * half - astarts_ref[t1c]) + 1
                         ).astype(jnp.float32)
                ncB = jnp.maximum(ncB_reset, jnp.max(
                    jnp.where(inclB & (alpha_t[half:] > 0.0), rankB, 0.0),
                    axis=0))
            else:
                ncB = jnp.zeros_like(s_prev)
            carry[2, :] = ncB

            @pl.when((next_t != t1) & (t1 < num_tiles))
            def _closeB():
                outB_ref[0, 3, :] = ftB
                outB_ref[0, NCONTRIB_ROW, :] = ncB

    return kernel


def _make_sorted_bwd_kernel(grid_x: int, chunk: int, num_tiles: int,
                            m_pad: int):
    half = chunk // 2

    def kernel(ht_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               g_hbm_ref, ckpt_ref, dpart_ref, qcarry, buf, sem, gbuf,
               gsem):
        pb = pl.num_programs(0)
        b = pb - 1 - pl.program_id(0)                  # reverse walk
        h0 = 2 * b
        t0 = ht_ref[h0]
        t1 = ht_ref[h0 + 1]
        later_t = ht_ref[h0 + 2]

        def src0_of(h):
            return _half_src0(h, half, ht_ref, astarts_ref, starts_ref,
                              m_pad, num_tiles)

        def g_dma(slot, hi, h):
            tc = jnp.clip(ht_ref[h], 0, num_tiles - 1)
            return pltpu.make_async_copy(
                g_hbm_ref.at[tc], gbuf.at[slot, hi], gsem.at[slot, hi])

        def start_block(bb, slot):
            """Issue block bb's streams: 2 q-table windows + the owning
            tiles' pixel-gradient rows (deduped when both halves belong
            to the same tile — ~half of all blocks at 1080p/100K)."""
            hh = 2 * bb
            _half_dma(feat_ref, buf, sem, slot, 0, src0_of(hh), half).start()
            _half_dma(feat_ref, buf, sem, slot, 1, src0_of(hh + 1),
                      half).start()
            g_dma(slot, 0, hh).start()

            @pl.when(ht_ref[hh + 1] != ht_ref[hh])
            def _gB():
                g_dma(slot, 1, hh + 1).start()

        # reverse-order double-buffered streams; sentinel blocks skip
        # (start and wait guarded by the same scalar conditions)
        slot = b % 2
        @pl.when((b == pb - 1) & (t0 < num_tiles))
        def _prologue():
            start_block(b, slot)

        @pl.when((b > 0) & (ht_ref[h0 - 2] < num_tiles))
        def _prefetch():
            start_block(b - 1, (b - 1) % 2)

        @pl.when(t0 < num_tiles)
        def _live_block():
            _half_dma(feat_ref, buf, sem, slot, 0, src0_of(h0), half).wait()
            _half_dma(feat_ref, buf, sem, slot, 1, src0_of(h0 + 1),
                      half).wait()
            g_dma(slot, 0, h0).wait()

            @pl.when(t1 != t0)
            def _gBwait():
                g_dma(slot, 1, h0 + 1).wait()

            # ---- combined alpha evaluation (identical to forward) ----
            featw = jnp.concatenate(
                [_half_extract(buf, slot, 0, src0_of(h0), half),
                 _half_extract(buf, slot, 1, src0_of(h0 + 1), half)], axis=1)
            raw_t = _raw_alphas_T(featw)                       # (chunk, PIX)
            wmask = _window_mask(h0, half, ht_ref, astarts_ref, counts_ref,
                                 num_tiles)
            # gradient-live: dead lanes have raw == 0 (< ALPHA_MIN), capped
            # splats are masked (consistent with forward's capped min)
            glive = (raw_t >= ALPHA_MIN) & (raw_t <= ALPHA_MAX) & wmask
            alpha_t = jnp.where(glive, raw_t, 0.0)

            # when both halves share a tile, half B's gradient rows were
            # never fetched — read half A's buffer for both
            sameAB = t1 == t0

            def gsel(hi):
                g0 = gbuf[slot, 0]
                if hi == 0:
                    return g0
                return jnp.where(sameAB, g0, gbuf[slot, 1])

            def half_grads(g8, alpha_h, s_in, rgb_h):
                """Within-half gradient core, transposed domain.

                alpha_h (half, PIX); g8 rows: 0..2 dL/dcolor,
                3 g_final_t, 4 final_t; rgb_h (3, half) lane-oriented.
                """
                om = 1.0 - alpha_h
                cum = _cumprod_sublanes(om)
                s_excl = s_in[None, :] * _shift_one_sublane(cum, 1.0)
                incl = (s_in[None, :] * cum) >= T_EPS
                w = alpha_h * s_excl * incl

                # dldw[l, p] = sum_c rgb[c, l] g[c, p] — MXU, no transposes
                dldw = jax.lax.dot_general(
                    rgb_h, g8[0:3, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (half, PIX)
                a_mat = dldw * w
                chunk_sum = jnp.sum(a_mat, axis=0)            # (PIX,)
                suffix = chunk_sum[None, :] - _cumsum_sublanes(a_mat)
                return w, om, incl, dldw, chunk_sum, suffix, s_excl

            rgb3 = featw[ROW_R:ROW_B + 1]                      # (3, chunk)
            gA8 = gsel(0)
            gB8 = gsel(1)

            # ---- half B first (reverse order within the block) ----
            @pl.when((t1 < num_tiles) & (t1 != later_t))
            def _initB():
                qcarry[0, :] = gB8[3, :] * gB8[NCONTRIB_ROW, :]

            sB_in = ckpt_ref[0, 1, :]
            wB, omB, inclB, dldwB, sumB, sufB, sexB = half_grads(
                gB8, alpha_t[half:], sB_in, rgb3[:, half:])
            qB = qcarry[0, :][None, :] + sufB
            dalphaB = (dldwB * sexB - qB / omB) * inclB

            @pl.when(t1 == t0)
            def _carryB():
                qcarry[0, :] += sumB

            @pl.when((t0 < num_tiles) & (t0 != t1))
            def _initA():
                qcarry[0, :] = gA8[3, :] * gA8[NCONTRIB_ROW, :]

            sA_in = ckpt_ref[0, 0, :]
            wA, omA, inclA, dldwA, sumA, sufA, sexA = half_grads(
                gA8, alpha_t[:half], sA_in, rgb3[:, :half])
            qA = qcarry[0, :][None, :] + sufA
            dalphaA = (dldwA * sexA - qA / omA) * inclA
            qcarry[0, :] += sumA

            # ---- per-lane cotangents for the whole block ----
            dalpha_t = jnp.concatenate([dalphaA, dalphaB], axis=0)
            dalpha_t = jnp.where(glive, dalpha_t, 0.0)
            dpower_t = dalpha_t * alpha_t                      # (chunk, PIX)

            # The VJP boundary is the q-TABLE, so the per-splat outputs
            # are exactly two MXU contractions over the pixels: dL/dq_j =
            # sum_p dpower basis_j (the moment matrix — rows 6..7 hit the
            # basis' zero pad and vanish) and dL/drgb = g . w. XLA chains
            # q -> (mean2d, conic, opacity) elementwise outside; the old
            # in-kernel polynomial reconstruction is gone.
            mom = jax.lax.dot_general(
                _pix_basis(), dpower_t, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # (8, chunk)
            cwA = jax.lax.dot_general(
                gA8[0:3, :], wA, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # (3, half)
            cwB = jax.lax.dot_general(
                gB8[0:3, :], wB, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            cw = jnp.concatenate([cwA, cwB], axis=1)          # (3, chunk)
            zero = jnp.zeros((chunk,), jnp.float32)
            dpart_ref[...] = jnp.concatenate([
                mom[0:6], cw,
                jnp.zeros((FEAT - 9, chunk), jnp.float32)], axis=0)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def blend_sorted_pallas(qtabT: jax.Array, block_tile: jax.Array,
                        aligned_starts: jax.Array, starts: jax.Array,
                        counts: jax.Array, sorted_shift: jax.Array,
                        grid_x: int, num_tiles: int, p_cap: int,
                        chunk: int = 128, with_contrib: bool = False):
    """Flat-grid ragged blend over the SORTED q-table (build_qtable).

    qtabT: (FEAT, m_pad) sorted, tile-grouped, depth-ordered q-table,
        padded by at least 2*chunk columns past the live range (padding
        may be garbage — dead lanes carry q0 = -1e30 and vanish).
    block_tile: (p_cap // (chunk // 2) + 1,) owning tile per aligned
        HALF-chunk (64-lane granule); num_tiles = sentinel.
    aligned_starts: half-aligned layout bookkeeping.
    starts: (num_tiles + 1,) sorted-domain tile ranges.
    counts: (num_tiles,) live pairs per tile (output masking only).
    sorted_shift: sorted position -> aligned offset (backward map).
    Returns (color (T, 3, PIX), final_t (T, PIX), n_contrib (T, PIX));
    the VJP yields dL/d qtabT (dL/dq rows + dL/drgb).
    """
    out, _ = _sorted_fwd_impl(qtabT, block_tile, aligned_starts,
                              starts, counts, grid_x, num_tiles, p_cap,
                              chunk, with_contrib)
    return out


def _sorted_fwd_impl(qtabT, block_tile, aligned_starts, starts,
                     counts, grid_x, num_tiles, p_cap, chunk,
                     with_contrib=False):
    f_rows, m_pad = qtabT.shape
    assert f_rows == FEAT and m_pad % chunk == 0, (f_rows, m_pad, chunk)
    pb = p_cap // chunk
    half = chunk // 2
    kernel = _make_sorted_fwd_kernel(grid_x, chunk, num_tiles, m_pad,
                                     with_contrib)

    def out_spec(parity):
        # sentinel halves (ht == num_tiles) land on a dedicated dump row
        # so their end-of-grid buffer writeback can never clobber a real
        # tile's row (the last live tile may only own the OTHER parity)
        return pl.BlockSpec(
            (1, 8, PIX),
            lambda b, ht, *s: (ht[2 * b + parity], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(
            out_spec(0),
            out_spec(1),
            pl.BlockSpec((1, 2, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, 2, FEAT, 2 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    zeros_out = jnp.zeros((num_tiles + 1, 8, PIX), jnp.float32)
    outA, outB, ckpt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles + 1, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((pb, 2, PIX), jnp.float32),
        ),
        input_output_aliases={5: 0, 6: 1},
    )(block_tile.astype(jnp.int32), aligned_starts.astype(jnp.int32),
      counts.astype(jnp.int32), starts.astype(jnp.int32), qtabT,
      zeros_out, zeros_out)
    out8 = outA[:num_tiles] + outB[:num_tiles]

    has = counts > 0
    color = jnp.where(has[:, None, None], out8[:, 0:3], 0.0)
    final_t = jnp.where(has[:, None], out8[:, 3], 1.0)
    n_contrib = jnp.where(has[:, None], out8[:, NCONTRIB_ROW], 0.0)
    return (color, final_t, n_contrib), ckpt


def _sorted_fwd_rule(qtabT, block_tile, aligned_starts, starts,
                     counts, sorted_shift, grid_x, num_tiles, p_cap, chunk,
                     with_contrib=False):
    out, ckpt = _sorted_fwd_impl(qtabT, block_tile, aligned_starts,
                                 starts, counts, grid_x, num_tiles, p_cap,
                                 chunk, with_contrib)
    _, final_t, _ = out
    return out, (qtabT, block_tile, aligned_starts, starts, counts,
                 sorted_shift, ckpt, final_t)


def _sorted_bwd_rule(grid_x, num_tiles, p_cap, chunk, with_contrib, res, cts):
    (qtabT, block_tile, aligned_starts, starts, counts, sorted_shift,
     ckpt, final_t) = res
    g_color, g_final_t, _ = cts
    f_rows, m_pad = qtabT.shape
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
            pl.BlockSpec(memory_space=pl.ANY),   # qtab (streamed by DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # g8 (streamed by DMA)
            pl.BlockSpec((1, 2, PIX), lambda b, *s: (pl.num_programs(0) - 1 - b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((FEAT, chunk), rev),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, 2, FEAT, 2 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, 2, 8, PIX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    dpartT = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT, p_cap), jnp.float32),
    )(block_tile.astype(jnp.int32), aligned_starts.astype(jnp.int32),
      counts.astype(jnp.int32), starts.astype(jnp.int32), qtabT, g8, ckpt)

    # aligned -> sorted: deterministic inverse gather (each live sorted
    # row has a unique aligned position); padding columns get zero
    m = sorted_shift.shape[0]
    dpart = dpartT.T                                     # (p_cap, FEAT)
    d_pad = jnp.concatenate([dpart, jnp.zeros_like(dpart[:1])])
    p_idx = jnp.arange(m, dtype=jnp.int32)
    dest = jnp.clip(p_idx + sorted_shift, 0, p_cap)
    d_sorted = d_pad[dest]                               # (m, FEAT)
    d_qtabT = jnp.zeros((f_rows, m_pad), dpart.dtype).at[:, :m].set(
        d_sorted.T)
    return (d_qtabT, None, None, None, None, None)


blend_sorted_pallas.defvjp(_sorted_fwd_rule, _sorted_bwd_rule)
