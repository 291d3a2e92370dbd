"""Device-mesh construction and band geometry for tile sharding.

The reference is single-GPU single-process (SURVEY.md §2.15); distribution
is introduced here as a first-class design. Round-1 strategy:

- 2D logical mesh ("data", "tile"): the data axis replicates the model and
  works on different cameras per step (gradient psum); the tile axis
  shards the image into contiguous horizontal tile bands — each device
  preprocesses all Gaussians (cheap, vectorized), then bins/sorts/blends
  only its own band (the expensive, pixel-proportional work).
- Parameter gradients are psum'd across both axes; SSIM crosses band
  boundaries via an explicit 5-row halo exchange (ppermute).
- Densify/compaction runs replicated (params are replicated); sharding
  Gaussians themselves over mesh regions is the planned next axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXIS = "data"
TILE_AXIS = "tile"


def make_mesh(n_data: int, n_tile: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert n_data * n_tile <= len(devices), (n_data, n_tile, len(devices))
    devs = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(devs, (DATA_AXIS, TILE_AXIS))


def band_rows(grid_y: int, n_tile: int) -> int:
    """Tile rows per band; grid_y must divide evenly (pad H upstream)."""
    assert grid_y % n_tile == 0, (grid_y, n_tile)
    return grid_y // n_tile


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Concatenate `halo` rows from the previous/next band along axis -2.

    x: (..., H_local, W). Edge devices receive zeros (matching the
    single-chip conv's zero padding). Differentiable (ppermute transposes
    to the reverse permutation under AD).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        pad = [(0, 0)] * (x.ndim - 2) + [(halo, halo), (0, 0)]
        return jnp.pad(x, pad)
    idx = jax.lax.axis_index(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]   # send to next band
    up = [(i, (i - 1) % n) for i in range(n)]     # send to previous band
    tail = x[..., -halo:, :]
    head = x[..., :halo, :]
    from_prev = jax.lax.ppermute(tail, axis_name, down)
    from_next = jax.lax.ppermute(head, axis_name, up)
    from_prev = jnp.where(idx == 0, 0.0, from_prev)
    from_next = jnp.where(idx == n - 1, 0.0, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=-2)
