"""Triangle midpoint subdivision (1->4 and 1->5) for densify-by-split.

Behavioral model: /root/reference/utils/general_utils.py:133-212
(`split_mesh_and_gaussian[_pro]`). Each selected face (a, b, c) produces the
four midpoint children

    0: (a,   m_ab, m_ac)
    1: (m_ab, b,   m_bc)
    2: (m_ac, m_bc, c)
    3: (m_ab, m_bc, m_ac)

and, in the 1->5 variant, a fifth child identical to the parent. Three new
vertices (m_ab, m_ac, m_bc) are appended per split face — like the
reference, midpoints are NOT deduplicated across adjacent faces (the proxy
mesh connectivity is only used for bookkeeping/export; Gaussians carry
explicit corner coordinates).

Implemented as pure batched jnp so it runs inside the jitted
densification/compaction step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# child -> (corner selectors). Encodes each child vertex as a fixed linear
# combination of the parent corners (a, b, c): weights rows sum to 1.
# Order matches the reference tables exactly.
# numpy, not jnp: module-level jnp.array would initialize the JAX
# backend at import time, before CLIs can select a platform
_CHILD_W = np.array(
    [
        # v1            v2              v3
        [[1.0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5]],   # child 0
        [[0.5, 0.5, 0], [0, 1.0, 0], [0, 0.5, 0.5]],   # child 1
        [[0.5, 0, 0.5], [0, 0.5, 0.5], [0, 0, 1.0]],   # child 2
        [[0.5, 0.5, 0], [0, 0.5, 0.5], [0.5, 0, 0.5]], # child 3
        [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]],       # child 4 (parent copy)
    ],
    dtype=np.float32,
)

# new-vertex slot per midpoint: 0=m_ab, 1=m_ac, 2=m_bc (reference layout).
# child -> (v1 idx code, v2 idx code, v3 idx code) where codes 0,1,2 are the
# original corners a,b,c and 3,4,5 are m_ab, m_ac, m_bc.
_CHILD_IDX_CODE = np.array(
    [
        [0, 3, 4],
        [3, 1, 5],
        [4, 5, 2],
        [3, 5, 4],
        [0, 1, 2],
    ],
    dtype=np.int32,
)


def subdivide(v1, v2, v3, vidx, n_children: int, v_base: jax.Array | int):
    """Full subdivision of N faces.

    Args:
      v1, v2, v3: (N, 3) corner coordinates.
      vidx: (N, 3) int vertex indices of the parents.
      n_children: 4 or 5.
      v_base: current global vertex count; 3 new vertices are appended per
        face at indices v_base + 3*i + {0,1,2} = (m_ab, m_ac, m_bc).

    Returns:
      (c_v1, c_v2, c_v3): (N, C, 3) child corner coordinates
      c_vidx: (N, C, 3) child vertex index triples
      new_v: (N, 3, 3) new vertex coordinates per face (m_ab, m_ac, m_bc)
    """
    n = v1.shape[0]
    corners = jnp.stack([v1, v2, v3], axis=1)                 # (N, 3, 3)
    W = _CHILD_W[:n_children]                                 # (C, 3, 3)
    child = jnp.einsum("cvk,nkd->ncvd", W, corners)           # (N, C, 3, 3)
    c_v1, c_v2, c_v3 = child[:, :, 0], child[:, :, 1], child[:, :, 2]

    new_v = jnp.stack(
        [(v1 + v2) * 0.5, (v1 + v3) * 0.5, (v2 + v3) * 0.5], axis=1
    )  # (N, 3, 3)

    base = v_base + 3 * jnp.arange(n, dtype=jnp.int32)        # (N,)
    # codes 0..2 -> parent vidx, 3..5 -> base + (code-3)
    code = _CHILD_IDX_CODE[:n_children]                       # (C, 3)
    code_b = jnp.broadcast_to(code, (n, n_children, 3))
    parent_pick = jnp.take_along_axis(
        vidx[:, None, :].repeat(n_children, axis=1),
        jnp.clip(code_b, 0, 2), axis=2)
    new_pick = base[:, None, None] + jnp.clip(code_b - 3, 0, 2)
    c_vidx = jnp.where(code_b < 3, parent_pick, new_pick).astype(jnp.int32)
    return (c_v1, c_v2, c_v3), c_vidx, new_v


def face_mean_edge_length(v1: jax.Array, v2: jax.Array, v3: jax.Array) -> jax.Array:
    """The per-face `r` used by the offset law (mesh_based_gaussian_model.py:208-215)."""
    a = jnp.linalg.norm(v1 - v2, axis=-1)
    b = jnp.linalg.norm(v2 - v3, axis=-1)
    c = jnp.linalg.norm(v3 - v1, axis=-1)
    return ((a + b + c) / 3.0)[..., None]


def face_normals(v1: jax.Array, v2: jax.Array, v3: jax.Array,
                 degenerate: tuple[float, float, float] = (1.0, 0.0, 0.0)) -> jax.Array:
    """Unit per-face normals; degenerate faces get `degenerate` (igl convention)."""
    n = jnp.cross(v2 - v1, v3 - v1)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    fallback = jnp.asarray(degenerate, dtype=n.dtype)
    return jnp.where(norm > 1e-12, n / jnp.maximum(norm, 1e-12), fallback)
