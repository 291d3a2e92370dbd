"""Mean squared distance to the 3 nearest neighbors — scale seeding at init.

TPU-native replacement for the reference's Morton-sorted CUDA simple_knn
(/root/reference/scene/simple_knn/simple_knn.cu:185-221, exposed as
`distCUDA2`). Instead of spatial hashing, we compute the exact answer with
chunked pairwise distances on the MXU: ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b,
then a 4-way top-k per row (self + 3 neighbors). Exact (the reference's
box-pruned scan is also exact), O(N^2) FLOPs but MXU-shaped — ~60 GFLOP at
N=100K, trivial for one chip, and only ever run once per training job.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def mean_sq_dist3(points: jax.Array, row_chunk: int = 1024) -> jax.Array:
    """points (N, 3) -> (N,) mean of squared distances to the 3 nearest."""
    n = points.shape[0]
    pad = (-n) % row_chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)

    def chunk(rows):
        r_pts, r_sq = rows
        d2 = (r_sq[:, None] + sq[None, :]
              - 2.0 * r_pts @ pts.T)                     # (chunk, Npad)
        # padded columns sit at the origin — push them to +inf
        col_pad = jnp.arange(pts.shape[0]) >= n
        d2 = jnp.where(col_pad[None, :], jnp.inf, d2)
        # 4 smallest include the self-distance (~0)
        neg_top, _ = jax.lax.top_k(-d2, 4)
        d4 = -neg_top                                    # ascending-ish
        return (jnp.sum(d4, axis=1) - d4[:, 0]) / 3.0

    out = jax.lax.map(chunk, (pts.reshape(-1, row_chunk, 3),
                              sq.reshape(-1, row_chunk)))
    return jnp.maximum(out.reshape(-1)[:n], 0.0)
