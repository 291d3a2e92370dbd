"""Tile binning: depth sort + tile sort -> chunk-aligned pair layout.

TPU-native replacement for the reference's duplicateWithKeys + cub radix
sort + identifyTileRanges pipeline
(/root/reference/gaussian_renderer/.../cuda_rasterizer/rasterizer_impl.cu:70-138,277-308).

Measured op economics on TPU shape the design: lax.sort (~8ms at 3.2M) and
cumsum (~1ms) are cheap, while every XLA gather/scatter over multi-million
1D arrays costs 15-40ms. The pipeline therefore moves data with sorts and
propagates per-tile quantities with tiny scatters (one element per tile)
plus cumsum, and performs exactly ONE large scatter (placing gaussian ids
into the chunk-aligned layout):

  1. argsort N Gaussians by view depth (invalid last);
  2. statically expand each depth-ranked Gaussian to its rect's
     (tile, gaussian) pairs — (N, max_tiles_per_gaussian) grid, invalid
     slots keyed to a sentinel tile;
  3. ONE stable sort of all N*MTG pairs by tile id — compaction falls out
     (sentinels sort to the end) and depth order is preserved per tile;
  4. per-tile ranges via searchsorted over the tile axis (num_tiles + 1
     binary searches), per-pair positions via a segment-start array built
     from a num_tiles-sized scatter + cumsum (no big gather);
  5. pad each tile's range to a multiple of `chunk` (aligned layout:
     every chunk-block belongs to exactly one tile) and scatter the ids
     to their aligned destinations. `pair_to_aligned` keeps the
     expansion->aligned index map so the rasterizer's backward can reduce
     pair gradients densely over the (N, MTG) expansion grid instead of a
     segment-sum scatter-add.

Everything is jit-compatible with static shapes; overflow of any capacity
is counted and reported rather than silently dropped.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.ops.preprocess import Preprocessed


class TileLists(NamedTuple):
    counts: jax.Array          # (num_tiles,) int32 — clamped to max_per_tile
    aligned_starts: jax.Array  # (num_tiles + 1,) int32 — aligned range starts
    aligned_gid: jax.Array     # (pair_capacity,) int32 — aligned, tile-grouped,
                               # depth-ordered gaussian ids; N = pad
    block_tile: jax.Array      # (pair_capacity // chunk + 1,) int32 owning tile
                               # per block; num_tiles = sentinel
    pair_to_aligned: jax.Array # (N * MTG,) int32 — expansion slot -> aligned
                               # position (pair_capacity = dropped/invalid);
                               # rows follow DEPTH-RANK order, `depth_order`
                               # maps rank -> gaussian id
    depth_order: jax.Array     # (N,) int32 — depth rank -> gaussian index
    num_rendered: jax.Array    # () int32 — total valid pairs before clamps
    tile_overflow: jax.Array   # () int32 — pairs dropped by max_per_tile
    rect_overflow: jax.Array   # () int32 — tiles dropped by max_tiles_per_gaussian
    pair_overflow: jax.Array   # () int32 — pairs dropped by pair_capacity


def _segment_const(values_per_tile: jax.Array, seg_starts: jax.Array,
                   length: int) -> jax.Array:
    """Segment-constant int32 array: out[i] = values_per_tile[t] for
    i in [seg_starts[t], seg_starts[t+1]), built with a num_tiles-sized
    scatter of diffs + one cumsum (big gathers are pathological on TPU)."""
    diffs = jnp.diff(values_per_tile, prepend=0)
    delta = jnp.zeros((length + 1,), jnp.int32).at[seg_starts].add(
        diffs, mode="drop")
    return jnp.cumsum(delta)[:length].astype(jnp.int32)


def build_tile_lists(prep: Preprocessed, grid_x: int, grid_y: int,
                     max_per_tile: int, max_tiles_per_gaussian: int,
                     pair_capacity: int | None = None,
                     chunk: int = 256) -> TileLists:
    n = prep.depth.shape[0]
    num_tiles = grid_x * grid_y
    mtg = max_tiles_per_gaussian
    m = n * mtg
    p_cap = pair_capacity or m
    assert p_cap % chunk == 0, (p_cap, chunk)

    # 1. depth order (invalid last)
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)             # (N,)

    rmin = prep.rect_min[order]                                  # (N, 2)
    rmax = prep.rect_max[order]
    touched = prep.tiles_touched[order]                          # (N,)
    valid = prep.valid[order]

    # 2. static pair expansion, row-major over the rect
    slot = jnp.arange(mtg, dtype=jnp.int32)                      # (MTG,)
    w = jnp.maximum(rmax[:, 0] - rmin[:, 0], 1)                  # (N,)
    tx = rmin[:, 0][:, None] + slot[None, :] % w[:, None]        # (N, MTG)
    ty = rmin[:, 1][:, None] + slot[None, :] // w[:, None]
    pair_ok = valid[:, None] & (slot[None, :] < jnp.minimum(touched, mtg)[:, None])
    pair_tile = jnp.where(pair_ok, ty * grid_x + tx, num_tiles).astype(jnp.int32)
    rect_overflow = jnp.sum(jnp.where(valid, jnp.maximum(touched - mtg, 0), 0))
    num_valid = jnp.sum(pair_ok.astype(jnp.int32))

    # 3. one stable sort by tile id; payloads carry both the gaussian id
    #    and the expansion index (a post-sort id gather would cost more
    #    than the extra sort operand)
    flat_tile = pair_tile.reshape(-1)
    exp_idx = jnp.arange(m, dtype=jnp.int32)
    gid_flat = jnp.broadcast_to(order[:, None], (n, mtg)).reshape(-1)
    sorted_tile, sorted_exp, sorted_gid = jax.lax.sort(
        (flat_tile, exp_idx, gid_flat), num_keys=1, is_stable=True)

    # 4. ranges + per-pair positions (segment-start array, no big gather)
    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    raw_counts = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw_counts, max_per_tile)
    tile_overflow = jnp.sum(raw_counts - counts)

    seg_start_arr = _segment_const(starts[:num_tiles], starts[:num_tiles], m)
    pos = exp_idx - seg_start_arr                                # within-tile rank
    # (entries past the last tile get garbage pos; masked below via counts)

    # 5. aligned layout
    aligned_counts = ((counts + chunk - 1) // chunk) * chunk
    astarts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(aligned_counts).astype(jnp.int32)])
    total_aligned = astarts[num_tiles]
    pair_overflow = (jnp.maximum(total_aligned - p_cap, 0)
                     + jnp.maximum(num_valid - p_cap, 0))
    astarts = jnp.minimum(astarts, p_cap)

    shift = astarts[:num_tiles] - starts[:num_tiles]             # (T,) small
    shift_arr = _segment_const(shift, starts[:num_tiles], m)
    count_arr = _segment_const(counts, starts[:num_tiles], m)
    in_range = (sorted_tile < num_tiles) & (pos < count_arr)
    adest = jnp.where(in_range, exp_idx + shift_arr, p_cap)
    adest = jnp.where(adest < p_cap, adest, p_cap)

    aligned_gid = jnp.full((p_cap,), n, jnp.int32).at[adest].set(
        sorted_gid, mode="drop")

    # expansion slot -> aligned position (for the dense backward reduction):
    # invert the tile sort with a scatter over the expansion grid
    pair_to_aligned = jnp.full((m,), p_cap, jnp.int32).at[sorted_exp].set(
        jnp.where(in_range, adest, p_cap), mode="drop")

    pb = p_cap // chunk
    block_starts = jnp.arange(pb + 1, dtype=jnp.int32) * chunk
    block_tile = (jnp.searchsorted(astarts, block_starts, side="right") - 1
                  ).astype(jnp.int32)
    block_tile = jnp.where(block_starts < total_aligned, block_tile, num_tiles)

    return TileLists(
        counts=counts,
        aligned_starts=astarts,
        aligned_gid=aligned_gid,
        block_tile=jnp.clip(block_tile, 0, num_tiles),
        pair_to_aligned=pair_to_aligned,
        depth_order=order,
        num_rendered=jnp.minimum(num_valid, p_cap).astype(jnp.int32),
        tile_overflow=tile_overflow,
        rect_overflow=rect_overflow,
        pair_overflow=pair_overflow,
    )


def tile_id_lists(tiles: TileLists, num_tiles: int, max_per_tile: int,
                  n: int) -> jax.Array:
    """Dense (num_tiles, max_per_tile) id matrix for the jnp fallback path
    (padded with the dummy id N). Built from the aligned layout."""
    p_cap = tiles.aligned_gid.shape[0]
    j = jnp.arange(p_cap, dtype=jnp.int32)
    tile_of_j = jnp.clip(
        jnp.searchsorted(tiles.aligned_starts, j, side="right") - 1,
        0, num_tiles - 1)
    pos = j - tiles.aligned_starts[tile_of_j]
    dest = jnp.where(pos < max_per_tile,
                     tile_of_j * max_per_tile + pos,
                     num_tiles * max_per_tile)
    lists = jnp.full((num_tiles * max_per_tile,), n, jnp.int32)
    lists = lists.at[dest].set(tiles.aligned_gid, mode="drop")
    return lists.reshape(num_tiles, max_per_tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_pair_features(feat, aligned_gid, pair_to_aligned, depth_order,
                         mtg: int):
    """pair_feats = feat[aligned_gid], with a custom VJP that reduces the
    pair gradients densely over the (N, MTG) expansion grid (one row
    gather + a dense sum + a permutation scatter) instead of autodiff's
    segment-sum — the random scatter-add costs ~4x more on TPU."""
    return feat[aligned_gid]


def _gpf_fwd(feat, aligned_gid, pair_to_aligned, depth_order, mtg: int):
    return feat[aligned_gid], (feat.shape, aligned_gid, pair_to_aligned,
                               depth_order)


def _gpf_bwd(mtg: int, res, d_pair):
    feat_shape, aligned_gid, pair_to_aligned, depth_order = res
    n = feat_shape[0] - 1
    f = feat_shape[1]
    d_pad = jnp.concatenate([d_pair, jnp.zeros((1, f), d_pair.dtype)])
    d_exp = d_pad[pair_to_aligned]                   # (N*MTG, F) row gather
    d_rank = d_exp.reshape(n, mtg, f).sum(axis=1)    # dense reduction
    d_feat = jnp.zeros(feat_shape, d_pair.dtype).at[depth_order].set(
        d_rank, mode="drop")
    return (d_feat, None, None, None)


gather_pair_features.defvjp(_gpf_fwd, _gpf_bwd)
