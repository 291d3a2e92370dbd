"""Tile binning: depth sort + stable tile sort -> fixed-capacity tile lists.

TPU-native replacement for the reference's duplicateWithKeys + cub radix
sort + identifyTileRanges pipeline
(/root/reference/gaussian_renderer/.../cuda_rasterizer/rasterizer_impl.cu:70-138,277-308).

Instead of sorting (tile << 32 | depth_bits) packed 64-bit keys over a
dynamically-sized duplication buffer, we:

  1. argsort the N Gaussians by view depth once (lax.sort, N keys);
  2. statically expand each depth-ranked Gaussian to at most
     `max_tiles_per_gaussian` (tile, gaussian) pairs (static shapes — JAX
     needs them; overflowing Gaussians get their rect truncated in
     row-major order and the overflow is reported);
  3. stably sort the pairs by tile id only (int32 keys) — stability
     preserves the depth order within each tile, so the second sort
     doesn't need the depth key at all;
  4. compute per-tile ranges by binary search and scatter the pair list
     into a dense (num_tiles, max_per_tile) index matrix, padded with the
     dummy index N (the rasterizer gives the dummy opacity 0).

Everything is jit-compatible with static shapes; per-tile overflow beyond
`max_per_tile` is counted and reported rather than silently dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.ops.preprocess import Preprocessed


class TileLists(NamedTuple):
    lists: jax.Array          # (num_tiles, max_per_tile) int32 gaussian ids; N = dummy
    counts: jax.Array         # (num_tiles,) int32 — clamped to max_per_tile
    num_rendered: jax.Array   # () int32 — total pairs before capacity clamp
    tile_overflow: jax.Array  # () int32 — pairs dropped by max_per_tile
    rect_overflow: jax.Array  # () int32 — tiles dropped by max_tiles_per_gaussian


def build_tile_lists(prep: Preprocessed, grid_x: int, grid_y: int,
                     max_per_tile: int,
                     max_tiles_per_gaussian: int) -> TileLists:
    n = prep.depth.shape[0]
    num_tiles = grid_x * grid_y
    mtg = max_tiles_per_gaussian

    # 1. depth order (invalid last)
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)            # (N,)

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
    pair_gid = jnp.broadcast_to(order[:, None], (n, mtg)).astype(jnp.int32)

    rect_overflow = jnp.sum(jnp.maximum(touched - mtg, 0))

    # 3. stable sort by tile id (depth order preserved within a tile)
    flat_tile = pair_tile.reshape(-1)
    flat_gid = pair_gid.reshape(-1)
    sorted_tile, sorted_gid = jax.lax.sort(
        (flat_tile, flat_gid), num_keys=1, is_stable=True)

    # 4. tile ranges + dense lists
    starts = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    raw_counts = starts[1:] - starts[:-1]                        # (num_tiles,)
    counts = jnp.minimum(raw_counts, max_per_tile)
    tile_overflow = jnp.sum(raw_counts - counts)
    num_rendered = jnp.sum(raw_counts)

    p = sorted_tile.shape[0]
    pos = jnp.arange(p, dtype=jnp.int32) - starts[jnp.clip(sorted_tile, 0, num_tiles - 1)]
    in_range = (sorted_tile < num_tiles) & (pos < max_per_tile)
    flat_idx = jnp.where(in_range,
                         sorted_tile * max_per_tile + pos,
                         num_tiles * max_per_tile)               # OOB -> dropped
    lists = jnp.full((num_tiles * max_per_tile,), n, dtype=jnp.int32)
    lists = lists.at[flat_idx].set(sorted_gid, mode="drop")
    return TileLists(
        lists=lists.reshape(num_tiles, max_per_tile),
        counts=counts,
        num_rendered=num_rendered,
        tile_overflow=tile_overflow,
        rect_overflow=rect_overflow,
    )
