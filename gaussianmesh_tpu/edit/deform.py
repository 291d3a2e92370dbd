"""Per-vertex deformation gradients — the ACAP GetRS replacement.

The reference calls into a missing native module (`pyACAP.GetRS`,
edittool/__init__.py:102-113, ACAP/pyACAPv1.zip) that returns per-vertex
rotation R and shear/stretch S factors of the deformation gradient
between a reference and a deformed mesh. TPU-native reimplementation:

  T_i = argmin_T sum_{j in ring(i)} || (v'_j - v'_i) - T (v_j - v_i) ||^2
      = A_i B_i^{-1},   A_i = sum e'_j e_j^T,  B_i = sum e_j e_j^T + eps I

batched over all vertices (fixed max ring degree, masked), followed by a
batched polar decomposition T = R S (SVD; det(R) = +1). This runs under
jit on TPU at mesh scale (10-20K vertices) in well under a millisecond —
the reference runs it on CPU threads per frame (the edit hot path).

A C++/OpenMP implementation with the same contract lives in
native/acap.cpp (loaded via ctypes) for host-side use; see
edit/native_acap.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gaussianmesh_tpu.utils import maths
from gaussianmesh_tpu.utils.maths import m9_to_dense


def build_one_ring(triangles: np.ndarray, n_vertices: int,
                   max_degree: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Adjacency (V, D) neighbor indices + (V, D) mask from faces (host)."""
    neigh = [[] for _ in range(n_vertices)]
    for a, b, c in triangles:
        for u, v in ((a, b), (b, c), (c, a)):
            if v not in neigh[u]:
                neigh[u].append(v)
            if u not in neigh[v]:
                neigh[v].append(u)
    deg = max((len(x) for x in neigh), default=0)
    d = min(max(deg, 3), max_degree)
    out = np.zeros((n_vertices, d), np.int32)
    mask = np.zeros((n_vertices, d), bool)
    for i, ns in enumerate(neigh):
        ns = ns[:d]
        out[i, :len(ns)] = ns
        mask[i, :len(ns)] = True
    return out, mask


def deformation_gradients9(v_ref: jax.Array, v_def: jax.Array,
                           neighbors: jax.Array, mask: jax.Array,
                           eps: float = 1e-8):
    """Component-form core: -> (R, S) as 9-tuples of (V,) arrays with
    T = R S the one-ring deformation gradient (identity on isolated or
    degenerate vertices). All math is elementwise over full-width (V,)
    and (V, D) vectors — no (V, 3, 3) intermediates, whose 3x3 minor
    dims pad to (8, 128) vregs on TPU and cost ~10x the whole phase."""
    e_ref = v_ref[neighbors] - v_ref[:, None, :]           # (V, D, 3)
    e_def = v_def[neighbors] - v_def[:, None, :]
    er = [jnp.where(mask, e_ref[..., i], 0.0) for i in range(3)]  # (V, D)
    ed = [jnp.where(mask, e_def[..., i], 0.0) for i in range(3)]

    # B = sum_d e e^T (+ eps I), A = sum_d e' e^T — component sums
    b = [[jnp.sum(er[i] * er[j], axis=-1) for j in range(3)] for i in range(3)]
    a = [[jnp.sum(ed[i] * er[j], axis=-1) for j in range(3)] for i in range(3)]
    b9 = tuple(b[i][j] + (eps if i == j else 0.0)
               for i in range(3) for j in range(3))
    a9 = tuple(a[i][j] for i in range(3) for j in range(3))

    b_inv, _ = maths.m9_inv_det(b9)   # adjugate — batched LU is scalar-bound
    t = maths.m9_mul(a9, b_inv)                       # T = A B^{-1}
    scale = b[0][0] + b[1][1] + b[2][2]               # tr(B) pre-eps
    ident = maths.m9_identity(scale)
    t = tuple(jnp.where(scale > 1e-12, c, ci) for c, ci in zip(t, ident))
    return maths.polar_rs9(t)


@functools.partial(jax.jit, static_argnames=())
def deformation_gradients(v_ref: jax.Array, v_def: jax.Array,
                          neighbors: jax.Array, mask: jax.Array,
                          eps: float = 1e-8):
    """Dense-API wrapper: -> (R (V,3,3), S (V,3,3))."""
    r9, s9 = deformation_gradients9(v_ref, v_def, neighbors, mask, eps)
    return m9_to_dense(r9), m9_to_dense(s9)


class MeshDeformer:
    """Holds the reference mesh + adjacency; maps deformed vertices to
    per-vertex (R, S) — the `pyACAP` object equivalent."""

    def __init__(self, v_ref: np.ndarray, triangles: np.ndarray,
                 max_degree: int = 16):
        self.v_ref = jnp.asarray(v_ref, jnp.float32)
        self.triangles = np.asarray(triangles, np.int32)
        neighbors, mask = build_one_ring(self.triangles, v_ref.shape[0],
                                         max_degree)
        self.neighbors = jnp.asarray(neighbors)
        self.mask = jnp.asarray(mask)

    def get_rs(self, v_def) -> tuple[jax.Array, jax.Array]:
        return deformation_gradients(self.v_ref, jnp.asarray(v_def, jnp.float32),
                                     self.neighbors, self.mask)
