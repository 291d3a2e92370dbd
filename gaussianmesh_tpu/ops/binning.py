"""Tile binning: offset-exact pair expansion + one sort -> aligned layout.

TPU-native replacement for the reference's duplicateWithKeys + cub radix
sort + identifyTileRanges pipeline
(/root/reference/gaussian_renderer/.../cuda_rasterizer/rasterizer_impl.cu:70-138,277-308).

Measured op economics on TPU shape the design (1e6-row arrays):
  stable sort           ~4.3 ns/row (near-independent of operand count)
  WIDE-row gather       ~4.5 ns/row for 64-byte rows (per row, not per byte)
  1-col gather/scatter  ~8-18 ns/element — pathological
  cumsum / cummax       ~2 ns/element

so the pipeline moves data with ONE sort and WIDE gathers, broadcasts
per-tile quantities with tiny scatters (one element per tile) + cumsum
("segment-constant" arrays), and has exactly one unavoidable scatter-add
(the per-Gaussian gradient reduction, in the caller's VJP):

  1. argsort N Gaussians by view depth (invalid last);
  2. TWO-STAGE offset-exact expansion: gaussians -> tile rows of their
     rect (exclusive-cumsum of rect heights; a block-local searchsorted
     recovers each row's parent — zero-count parents emit one flagged
     dummy child so offsets stay strictly increasing), then rows ->
     (tile, gaussian) pairs using the EXACT per-row x-extent of the
     gated ellipse (alpha >= 1/255; `_row_x_extent`). The pair domain
     therefore holds
     only pairs the blend kernel could actually shade — no rect-bbox
     corner waste — which shrinks the sort, both gathers, the blend
     grid, and the gradient scatter by the same factor (~2x vs bbox
     enumeration; more at training-typical low opacities);
  3. WIDE gathers land per-parent data on each expansion domain (every
     field exactly representable in f32); child -> tile decode is pure
     elementwise math;
  4. ONE stable sort by tile id (slots are depth-ordered, so stability
     gives per-tile depth order; sentinels sort to the end);
  5. per-tile ranges via searchsorted; the chunk-aligned layout for the
     blend kernel is expressed as a GATHER (src map built from two
     segment-constant arrays), not a scatter.

Everything is jit-compatible with static shapes; overflow of any capacity
is counted and reported rather than silently dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.ops.preprocess import Preprocessed

TILE = 16
ALPHA_MIN = 1.0 / 255.0
# Aligned-layout granule (lanes). Fixed independent of the blend chunk:
# the blend kernel processes chunk // ALIGN granules per grid step, so
# growing the chunk amortizes per-block latency WITHOUT growing per-tile
# padding waste (tiles pay <= ALIGN-1 pad lanes each). 64 = 8 sublane
# tiles in the kernel's transposed (pairs-on-sublanes) domain, keeping
# granule slices tile-aligned, and is the measured sweet spot: the
# rejected ALIGN=32 alternative shrank the aligned pair domain ~12% at
# 1080p/100K but LOST 1.6 ms/step — the doubled per-granule overhead
# (window rolls, scalar branches, cross-granule combines at
# G = chunk/ALIGN = 8) outweighed the fewer vector elements (round-4
# measurement).
ALIGN = 64
# slack on the cull threshold so rounding differences between the
# closed-form q_min and the blend kernel's own alpha can never cull a
# pair the kernel would have kept (alpha ratio e^{5e-5} of headroom)
_CULL_SLACK = 1e-4


class TileLists(NamedTuple):
    counts: jax.Array          # (num_tiles,) int32 — clamped to max_per_tile
    starts: jax.Array          # (num_tiles + 1,) int32 — per-tile ranges in
                               # the SORTED pair domain
    aligned_starts: jax.Array  # (num_tiles + 1,) int32 — aligned range starts
    sorted_gid: jax.Array      # (expand_capacity,) int32 — tile-grouped,
                               # depth-ordered gaussian ids; N = dummy
    sorted_tile: jax.Array     # (expand_capacity,) int32 — owning tile per
                               # sorted pair; num_tiles = sentinel
    in_count: jax.Array        # (expand_capacity,) bool — pair is within its
                               # tile's granted (clamped) count
    sorted_shift: jax.Array    # (expand_capacity,) int32 — sorted position ->
                               # aligned position offset (aligned = p + shift;
                               # out-of-range marked pair_capacity)
    block_tile: jax.Array      # (pair_capacity // ALIGN + 1,) int32
                               # owning tile per aligned ALIGN-granule;
                               # num_tiles = sentinel
    num_rendered: jax.Array    # () int32 — live pairs after the ellipse cull
    tile_overflow: jax.Array   # () int32 — pairs dropped by max_per_tile
    rect_overflow: jax.Array   # () int32 — rows dropped by row_capacity +
                               # pairs dropped by expand_capacity (either
                               # upstream shortage; both answer to growing
                               # the per-gaussian capacity factors)
    pair_overflow: jax.Array   # () int32 — pairs dropped by pair_capacity
    gid_counts: jax.Array | None = None  # (n,) int32 exact per-gaussian
                               # pair multiplicities (PairExpansion), when
                               # the producer knows them; None on paths
                               # that build lists from received pairs


def _segment_const(values_per_tile: jax.Array, seg_starts: jax.Array,
                   length: int) -> jax.Array:
    """Segment-constant array: out[i, c] = values_per_tile[t, c] for
    i in [seg_starts[t], seg_starts[t+1]), built with a num_tiles-sized
    scatter of diffs + one cumsum (per-element gathers are pathological
    on TPU). values_per_tile may be (T,) or (T, C)."""
    diffs = jnp.diff(values_per_tile, prepend=0, axis=0)
    shape = (length + 1,) + values_per_tile.shape[1:]
    delta = jnp.zeros(shape, jnp.int32).at[seg_starts].add(diffs, mode="drop")
    return jnp.cumsum(delta, axis=0)[:length].astype(jnp.int32)


def _row_x_extent(my, ca, cb, cc, qcut, ty):
    """Exact x-extent of the gated ellipse within one tile row.

    The blend kernel zeroes any pixel with alpha = op*exp(-q/2) < 1/255
    (forward.cu:330-345), q(d) = ca dx^2 + 2 cb dx dy + cc dy^2 in conic
    coords, so only {q <= qcut} pixels contribute. For the row's pixel
    band dy in [ly, hy], the reachable dx set is the projection of
    {q <= qcut, dy in band} — an interval. At fixed dy:
        dx_max(dy) = (-cb dy + sqrt(ca qcut - det dy^2)) / ca
    concave in dy with unconstrained maximizer dy* = -cb sqrt(qcut/(det cc))
    (the ellipse's rightmost point), so the band max is at clip(dy*);
    dx_min is the mirror image. Enumerating rows x these intervals equals
    the per-(gaussian, tile) exact cull (a tile intersects the gated
    region iff its x-range meets its row's interval) but costs one
    elementwise pass on the ROW domain instead of the pair domain.

    Returns (dx_min, dx_max) relative to the mean; empty rows come back
    with dx_min > dx_max.
    """
    ly = ty * TILE - my
    hy = ly + (TILE - 1)
    det = jnp.maximum(ca * cc - cb * cb, 1e-12)
    dy_star = -cb * jnp.sqrt(qcut / (det * cc))

    def bound(dy, sign):
        s = jnp.sqrt(jnp.maximum(ca * qcut - det * dy * dy, 0.0))
        return (-cb * dy + sign * s) / ca

    dx_max = bound(jnp.clip(dy_star, ly, hy), 1.0)
    dx_min = bound(jnp.clip(-dy_star, ly, hy), -1.0)
    # band entirely outside the ellipse's y-extent -> empty
    ey = jnp.sqrt(qcut * ca / det)
    empty = (ly > ey) | (hy < -ey)
    return (jnp.where(empty, 1.0, dx_min - 0.5),
            jnp.where(empty, 0.0, dx_max + 0.5))


def _offset_expand(counts: jax.Array, capacity: int):
    """Offset-exact expansion for STRICTLY POSITIVE counts: parent i owns
    the contiguous child range [off[i], off[i+1]). Returns (off (n+1,),
    parent (capacity,) int32 — child slot -> parent index, clamped to
    n-1 past the total —, total, overflow).

    Requiring counts >= 1 (callers force zero-count parents to emit one
    flagged dummy child) makes `off` strictly increasing, so parent
    recovery is a block-local searchsorted: parent[j] = #{i: off[i+1] <=
    j}, computed per 128-slot block as a positioned candidate window
    (<= 128 boundaries can fall in a block — strictness guarantees it)
    + one clustered gather + a lane count. The previous recovery
    (idx scatter-max at range starts + capacity-length cummax) paid the
    pathological per-row XLA scatter cost — ~16 ns/row on the PARENT
    domain — which dominated expand_pairs (PERF.md)."""
    n = counts.shape[0]
    off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(counts).astype(jnp.int32)])
    total = off[n]
    overflow = jnp.maximum(total - capacity, 0)
    off1 = off[1:]
    blk = 128
    nb = -(-capacity // blk)
    # s[b] = #{i: off1[i] < 128 b} — searchsorted at the block bases
    s = _searchsorted_left(off1, jnp.arange(nb, dtype=jnp.int32) * blk)
    # Candidate boundaries are off1[s[b] + k], k < 128: strict
    # monotonicity bounds off1[s[b] + k] >= 128 b + k, so k >= 128 can
    # never satisfy off1 <= j for j < 128 (b + 1) — 128 candidates are
    # EXACTLY sufficient. Fetching that misaligned window as an element
    # gather costs the pathological per-ELEMENT rate (~8 ns x capacity —
    # it dominated expand_pairs, round-3 profile); instead gather the TWO
    # 128-ALIGNED wide rows covering [s[b], s[b] + 128) (s[b] >= 128 A
    # with A = s[b] >> 7 puts the window inside rows A, A + 1) and count
    # over all 256 candidates with an index-window mask — two wide row
    # gathers + a fused compare-count, no element gather.
    nrows = -(-n // blk)
    pad = nrows * blk - n
    big = jnp.iinfo(jnp.int32).max
    off1p = jnp.concatenate([off1, jnp.full((pad + blk,), big, jnp.int32)])
    rows = off1p.reshape(nrows + 1, blk)
    a_row = jnp.minimum(s // blk, nrows)
    cand = jnp.concatenate(
        [rows[a_row], rows[jnp.minimum(a_row + 1, nrows)]], axis=1)
    cidx = a_row[:, None] * blk + jnp.arange(2 * blk, dtype=jnp.int32)[None, :]
    cand_ok = (cidx >= s[:, None]) & (cidx < n)           # (nb, 256)
    kidx = jnp.arange(blk, dtype=jnp.int32)[None, :]
    j = (jnp.arange(nb, dtype=jnp.int32) * blk)[:, None] + kidx
    cnt = jnp.sum(((cand[:, None, :] <= j[:, :, None])
                   & cand_ok[:, None, :]).astype(jnp.int32), axis=-1)
    parent = jnp.minimum((s[:, None] + cnt).reshape(-1)[:capacity], n - 1)
    return off, parent, total, overflow


def _offset_expand_propagate(counts: jax.Array, capacity: int,
                             payload: jax.Array):
    """`_offset_expand` fused with parent-payload propagation: instead of
    returning the parent map for a separate `payload[parent]` gather
    (per-ROW cost on the big child domain — the narrow-row stage-2
    gather was ~4 ms/step at bench scale), select each child's payload
    from the SAME two aligned 128-rows that the rank recovery already
    reads: the parent of child j lies at window position
    (s[b] mod 128) + cnt[b, j], so a one-hot masked reduction over the
    256 candidates propagates every column with fused elementwise math —
    no per-element gather. Payload must be f32 with integer-exact values
    (< 2^24) or true floats. Returns (off, selected (capacity, C),
    total, overflow)."""
    n = counts.shape[0]
    off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(counts).astype(jnp.int32)])
    total = off[n]
    overflow = jnp.maximum(total - capacity, 0)
    off1 = off[1:]
    blk = 128
    nb = -(-capacity // blk)
    s = _searchsorted_left(off1, jnp.arange(nb, dtype=jnp.int32) * blk)
    nrows = -(-n // blk)
    pad = nrows * blk - n
    big = jnp.iinfo(jnp.int32).max
    off1p = jnp.concatenate([off1, jnp.full((pad + blk,), big, jnp.int32)])
    rows = off1p.reshape(nrows + 1, blk)
    a_row = jnp.minimum(s // blk, nrows)
    b_row = jnp.minimum(a_row + 1, nrows)
    cand = jnp.concatenate([rows[a_row], rows[b_row]], axis=1)
    cidx = a_row[:, None] * blk + jnp.arange(2 * blk, dtype=jnp.int32)[None, :]
    cand_ok = (cidx >= s[:, None]) & (cidx < n)
    kidx = jnp.arange(blk, dtype=jnp.int32)[None, :]
    j = (jnp.arange(nb, dtype=jnp.int32) * blk)[:, None] + kidx
    cnt = jnp.sum(((cand[:, None, :] <= j[:, :, None])
                   & cand_ok[:, None, :]).astype(jnp.int32), axis=-1)

    c_cols = payload.shape[1]
    payp = jnp.concatenate(
        [payload, jnp.zeros((pad + blk, c_cols), payload.dtype)])
    prows = payp.reshape(nrows + 1, blk, c_cols)
    candp = jnp.concatenate([prows[a_row], prows[b_row]], axis=1)  # (nb,256,C)
    # window position of each child's parent (in [0, 256) by the strict-
    # monotonicity window bound); children past `total` read garbage that
    # callers mask via `total`
    wpos = (s[:, None] - a_row[:, None] * blk) + cnt       # (nb, 128)
    onehot = wpos[:, :, None] == jnp.arange(2 * blk, dtype=jnp.int32)
    sel = jnp.sum(jnp.where(onehot[..., None], candp[:, None, :, :], 0.0),
                  axis=2)                                  # (nb, 128, C)
    selected = sel.reshape(-1, c_cols)[:capacity]
    return off, selected, total, overflow


def _searchsorted_left(a: jax.Array, q: jax.Array) -> jax.Array:
    """out[k] = #{i: a[i] < q[k]} for sorted int32 `a` (searchsorted
    left). jnp.searchsorted lowers to an XLA while-loop whose
    per-iteration 1-element gathers dominate the whole binning pipeline
    on TPU (~6ms for 8K queries over 900K keys). This two-level search
    costs ~20x less: an UNROLLED branchless binary search over the
    128-stride block heads (log2(m/128) wide-vector steps, each one
    small gather), then one clustered (Q, 128) row gather and a lane
    count."""
    m = a.shape[0]
    blk = 128
    nb = -(-m // blk)
    pad = nb * blk - m
    big = jnp.iinfo(jnp.int32).max
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), big, jnp.int32)])
    rows = a.reshape(nb, blk)
    heads = rows[:, 0]                                   # (nb,)

    # first block b with heads[b] >= q  (range 0..nb)
    lo = jnp.zeros_like(q)
    hi = jnp.full_like(q, nb)
    steps = max(1, nb.bit_length())
    for _ in range(steps):
        active = lo < hi            # converged lanes stop (mid stays < nb)
        mid = (lo + hi) // 2
        go_right = heads[mid] < q
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    # crossing block: the one before lo (its head < q, next head >= q)
    b = jnp.maximum(lo - 1, 0)
    in_block = jnp.sum((rows[b] < q[:, None]).astype(jnp.int32), axis=1)
    return jnp.where(lo > 0, b * blk + in_block, 0).astype(jnp.int32)


def _tile_starts(sorted_tile: jax.Array, num_tiles: int) -> jax.Array:
    """starts[t] = first index with sorted_tile >= t, t in 0..num_tiles."""
    return _searchsorted_left(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32))


class PairExpansion(NamedTuple):
    """Stage 1+2 output: the unsorted (tile, gaussian) pair domain.

    Split out of build_tile_lists so the Gaussian-sharded path can run
    the expansion locally, exchange pairs to their band owners
    (all-to-all), and only then sort + build tile lists on the receiver
    (parallel/gauss_shard.py)."""
    pair_tile: jax.Array    # (m,) int32; num_tiles = sentinel
    gid_slot: jax.Array     # (m,) int32; n = sentinel
    pair_depth: jax.Array   # (m,) f32 view depth of the parent (inf pad)
    num_valid: jax.Array    # () int32
    rect_overflow: jax.Array
    gid_counts: jax.Array   # (n,) int32 — EXACT #pairs emitted per
                            # gaussian (slots with gid_slot == g); feeds
                            # segsum.gather_rows_counted so the gradient
                            # reduction skips its per-destination search


def build_tile_lists(prep: Preprocessed, grid_x: int, grid_y: int,
                     max_per_tile: int, expand_capacity: int,
                     pair_capacity: int, chunk: int = 128,
                     opacity: jax.Array | None = None,
                     row_capacity: int | None = None) -> TileLists:
    num_tiles = grid_x * grid_y
    exp = expand_pairs(prep, grid_x, grid_y, expand_capacity,
                       opacity=opacity, row_capacity=row_capacity)
    # ONE stable 2-key sort by (tile, depth) — the reference's 64-bit
    # tile|depth key (rasterizer_impl.cu:70-111) without the key pack.
    # Carrying depth as a second sort key instead of pre-sorting the N
    # Gaussians by depth saves an N-domain argsort + wide gather per
    # frame (~5 ms at 100K/1080p); ties break on gid (stable + natural
    # emission order), matching the gauss-sharded receiver's 3-key sort.
    sorted_tile, _, sorted_gid = jax.lax.sort(
        (exp.pair_tile, exp.pair_depth, exp.gid_slot), num_keys=2,
        is_stable=True)
    tiles = finish_tile_lists(sorted_tile, sorted_gid, exp.num_valid,
                              exp.rect_overflow, num_tiles, max_per_tile,
                              pair_capacity, chunk)
    return tiles._replace(gid_counts=exp.gid_counts)


def expand_pairs(prep: Preprocessed, grid_x: int, grid_y: int,
                 expand_capacity: int, opacity: jax.Array | None = None,
                 row_capacity: int | None = None) -> PairExpansion:
    n = prep.depth.shape[0]
    num_tiles = grid_x * grid_y
    m = expand_capacity
    assert m < (1 << 24), m  # int-valued f32 transport bound
    m1 = row_capacity if row_capacity is not None else max(m // 2, 1)

    # 1. depth rides as pair payload; the (tile, depth) order is produced
    # by the caller's 2-key pair sort (no N-domain depth argsort).
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)

    # 2. stage 1: gaussians -> tile ROWS of their rect (offset-exact).
    # Every int-valued f32 field below is exact (values < 2^24).
    # Per-gaussian fields travel in ONE wide (N, 12) table: TPU gathers
    # cost per ROW, so five separate field gathers (and especially a
    # 1-col opacity gather, ~39 ns/elem) cost ~6x one fused row gather
    # of the same data.
    if opacity is not None:
        op_flat = jax.lax.stop_gradient(opacity.reshape(-1))
    else:
        op_flat = jnp.ones((n,), jnp.float32)
    # gate threshold: alpha = op*exp(-q/2) >= 1/255 -> q <= 2 ln(255 op);
    # slack keeps fp rounding from culling a pair the kernel would keep
    qcut_all = 2.0 * jnp.log(jnp.maximum(op_flat, 1e-12) / ALPHA_MIN) + _CULL_SLACK

    heights_raw = jnp.where(
        prep.valid, prep.rect_max[:, 1] - prep.rect_min[:, 1],
        0).astype(jnp.int32)
    # _offset_expand requires strictly positive counts (searchsorted
    # rank recovery): zero-height gaussians emit one flagged dummy row
    heights = jnp.maximum(heights_raw, 1)
    roff, rank1, total_rows, row_overflow = _offset_expand(heights, m1)

    tab1 = jnp.stack([
        roff[:n].astype(jnp.float32),                 # 0 row-range start
        prep.rect_min[:, 1].astype(jnp.float32),      # 1 first rect row
        prep.mean2d[:, 0], prep.mean2d[:, 1],         # 2, 3
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],  # 4, 5, 6
        jnp.maximum(qcut_all, 0.0),                   # 7
        prep.rect_min[:, 0].astype(jnp.float32),      # 8 x clip lo
        prep.rect_max[:, 0].astype(jnp.float32),      # 9 x clip hi
        jnp.arange(n, dtype=jnp.float32),             # 10 gaussian id
        depth_key,                                    # 11 view depth
        heights_raw.astype(jnp.float32),              # 12 true height
    ], axis=-1)                                                  # (N, 13)
    row_tab = tab1[rank1]                                        # (m1, 13)

    # 3. per-row EXACT x-extent of the gated ellipse (elementwise)
    i1 = jnp.arange(m1, dtype=jnp.int32)
    rr = i1 - row_tab[:, 0].astype(jnp.int32)
    ty = row_tab[:, 1].astype(jnp.int32) + rr
    real_row = rr < row_tab[:, 12].astype(jnp.int32)  # not a forced dummy
    ca, cb, cc = row_tab[:, 4], row_tab[:, 5], row_tab[:, 6]
    pd = (ca > 0) & (cc > 0) & (ca * cc > cb * cb)
    dx_min, dx_max = _row_x_extent(row_tab[:, 3], ca, cb, cc, row_tab[:, 7],
                                   ty.astype(jnp.float32))
    mx = row_tab[:, 2]
    # non-PD conics (degenerate; preprocess already culled det==0) fall
    # back to the full rect width
    lo = jnp.where(pd, jnp.floor((mx + dx_min) / TILE), row_tab[:, 8])
    hi = jnp.where(pd, jnp.floor((mx + dx_max) / TILE) + 1.0, row_tab[:, 9])
    tx0 = jnp.clip(lo, row_tab[:, 8], row_tab[:, 9]).astype(jnp.int32)
    tx1 = jnp.clip(hi, row_tab[:, 8], row_tab[:, 9]).astype(jnp.int32)
    # a PD row whose pixel band misses the gated ellipse entirely comes
    # back with dx_min > dx_max: emit nothing (the +-0.5 sentinel would
    # otherwise round to a spurious width-1 pair that the blend alpha-
    # gates to zero but that still costs sort/blend capacity)
    row_live = jnp.where(pd, dx_min <= dx_max, True)
    width_real = jnp.where((i1 < total_rows) & real_row & row_live,
                           jnp.maximum(tx1 - tx0, 0), 0)
    # strictness again: zero-width rows emit one sentinel-tiled pair
    widths = jnp.maximum(width_real, 1)

    # 4. stage 2: rows -> (tile, gaussian) pairs. Only a few per-row
    # values are needed because a row's pairs cover CONSECUTIVE tiles:
    # tile(j) = base + j with base = (ty*gx + tx0) - toff[row] (exact
    # int32 telescoping). The payload travels through the fused
    # rank-recovery + windowed select (every column integer-exact in
    # f32; depth is f32 already) — no per-row gather on the pair domain.
    dummy_row = width_real == 0
    # row starts (cumsum of widths) are needed INSIDE the payload (base
    # pre-shifted by the row start so tile(j) = base + j telescopes);
    # _offset_expand_propagate recomputes the same cumsum and XLA CSEs it
    toff = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(widths).astype(jnp.int32)])
    base = (ty * grid_x + tx0) - toff[:m1]
    # every payload column is f32-exact for rows that can be selected:
    # |base| < 2^24 because a selected row has toff[row] <= j < m, and
    # id/flag are small ints; depth is f32 natively (no bitcast)
    pay = jnp.stack([jnp.where(dummy_row, 0, base).astype(jnp.float32),
                     row_tab[:, 10],                    # gaussian id
                     row_tab[:, 11],                    # view depth (f32)
                     dummy_row.astype(jnp.float32)], axis=-1)
    _, sv, total, pair_lost = _offset_expand_propagate(widths, m, pay)
    rect_overflow = row_overflow + pair_lost
    n_dummy = jnp.sum((dummy_row
                       & (toff[:m1] < jnp.minimum(total, m))).astype(jnp.int32))

    j = jnp.arange(m, dtype=jnp.int32)
    pair_ok = (j < total) & (sv[:, 3] == 0.0)
    pair_tile = jnp.where(pair_ok, sv[:, 0].astype(jnp.int32) + j,
                          num_tiles)
    gid_slot = jnp.where(pair_ok, sv[:, 1].astype(jnp.int32), n)
    pair_depth = jnp.where(pair_ok, sv[:, 2], jnp.inf)
    num_valid = jnp.minimum(total, m) - n_dummy

    # EXACT per-gaussian emitted-pair counts (slots with gid_slot == g):
    # per-row kept width (capacity-clipped), segment-summed over each
    # gaussian's row range with a log-step in-segment tree — ranks (rr)
    # and range starts (roff) are already known, so the gradient
    # reduction consuming these (segsum.gather_rows_counted) never
    # searches for its segment boundaries.
    cnt_row = jnp.minimum(jnp.clip(m - toff[:m1], 0, None), width_real)
    x = cnt_row.astype(jnp.int32)
    d = 1
    max_seg = max(2, grid_y)          # segment length <= rect height <= gy
    while d < max_seg:
        shifted = jnp.concatenate([x[d:], jnp.zeros((d,), jnp.int32)])
        same = jnp.concatenate([rank1[d:] == rank1[:m1 - d],
                                jnp.zeros((d,), bool)])
        x = jnp.where(((rr & (2 * d - 1)) == 0) & same, x + shifted, x)
        d *= 2
    xz = jnp.concatenate([x, jnp.zeros((1,), jnp.int32)])
    gid_counts = xz[jnp.minimum(roff[:n], m1)]

    return PairExpansion(pair_tile=pair_tile, gid_slot=gid_slot,
                         pair_depth=pair_depth, num_valid=num_valid,
                         rect_overflow=rect_overflow,
                         gid_counts=gid_counts)


def finish_tile_lists(sorted_tile: jax.Array, sorted_gid: jax.Array,
                      num_valid, rect_overflow, num_tiles: int,
                      max_per_tile: int, pair_capacity: int,
                      chunk: int = 128) -> TileLists:
    """Per-tile ranges + ALIGN-granule bookkeeping from the SORTED
    pair domain (tile-grouped, depth-ordered within tile).

    Alignment granule = ALIGN (64) regardless of chunk: the blend kernel
    processes chunk // ALIGN independent granules per grid step
    (tile_blend.py), so tiles only pay up to ALIGN-1 lanes of padding
    (~25% lane waste at 1080p/100K) while the chunk can grow to amortize
    per-block latency."""
    m = sorted_tile.shape[0]
    p_cap = pair_capacity
    half = ALIGN
    assert p_cap % chunk == 0 and chunk % ALIGN == 0, (p_cap, chunk)

    # 6. ranges + aligned layout (gathers, no big scatter)
    starts = _tile_starts(sorted_tile, num_tiles)
    raw_counts = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw_counts, max_per_tile)
    tile_overflow = jnp.sum(raw_counts - counts)

    aligned_counts = ((counts + half - 1) // half) * half
    astarts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(aligned_counts).astype(jnp.int32)])
    total_aligned = astarts[num_tiles]
    pair_overflow = jnp.maximum(total_aligned - p_cap, 0)
    astarts = jnp.minimum(astarts, p_cap)
    # Degrade gracefully on aligned-domain overflow: a tile only renders
    # the pairs it was actually GRANTED aligned space for (zero for tiles
    # clamped away entirely). Without this, counts>0 tiles with no blocks
    # are never written by the blend kernel and their output rows pass
    # the counts>0 mask as uninitialized memory.
    counts = jnp.minimum(counts, astarts[1:] - astarts[:-1])

    # sorted position p -> aligned position (for the deterministic
    # inverse-gather in the blend VJP): aligned = p + shift[t(p)] when the
    # entry is within its tile's (possibly clamped) count
    shift_vals = jnp.stack([astarts[:num_tiles] - starts[:num_tiles],
                            starts[:num_tiles] + counts], axis=-1)
    segp = _segment_const(shift_vals, starts[:num_tiles], m)     # (m, 2)
    p_idx = jnp.arange(m, dtype=jnp.int32)
    in_cnt = (p_idx < segp[:, 1]) & (sorted_tile < num_tiles)
    sorted_shift = jnp.where(in_cnt, segp[:, 0], p_cap - p_idx)

    pb2 = p_cap // half
    half_starts = jnp.arange(pb2 + 1, dtype=jnp.int32) * half
    # block_tile[h] = owning tile of aligned HALF-chunk h:
    # #{t : astarts[t] <= h*half} - 1 (searchsorted-right over
    # half-ALIGNED astarts): a (T+1)-sized scatter + one cumsum instead
    # of a second XLA binary-search while-loop
    delta = jnp.zeros((pb2 + 1,), jnp.int32).at[astarts // half].add(
        1, mode="drop")
    block_tile = jnp.cumsum(delta).astype(jnp.int32) - 1
    block_tile = jnp.where(half_starts < total_aligned, block_tile, num_tiles)

    return TileLists(
        counts=counts,
        starts=starts,
        aligned_starts=astarts,
        sorted_gid=sorted_gid,
        sorted_tile=sorted_tile,
        in_count=in_cnt,
        sorted_shift=sorted_shift,
        block_tile=jnp.clip(block_tile, 0, num_tiles),
        num_rendered=jnp.minimum(num_valid, m).astype(jnp.int32),
        tile_overflow=tile_overflow,
        rect_overflow=rect_overflow,
        pair_overflow=pair_overflow,
    )


def tile_id_lists(tiles: TileLists, num_tiles: int, max_per_tile: int,
                  n: int) -> jax.Array:
    """Dense (num_tiles, max_per_tile) id matrix for the jnp fallback path
    (padded with the dummy id N). Built from the sorted domain + starts."""
    m = tiles.sorted_gid.shape[0]
    starts = tiles.starts
    seg = _segment_const(
        jnp.stack([jnp.arange(num_tiles, dtype=jnp.int32),
                   starts[:num_tiles] + tiles.counts], axis=-1),
        starts[:num_tiles], m)                       # (m, 2): tile, end
    p = jnp.arange(m, dtype=jnp.int32)
    tile_of_p = seg[:, 0]
    rank = p - starts[tile_of_p]
    live = (p < seg[:, 1]) & (rank < max_per_tile) & (p < starts[num_tiles])
    dest = jnp.where(live, tile_of_p * max_per_tile + rank,
                     num_tiles * max_per_tile)
    lists = jnp.full((num_tiles * max_per_tile,), n, jnp.int32)
    lists = lists.at[dest].set(tiles.sorted_gid, mode="drop")
    return lists.reshape(num_tiles, max_per_tile)
