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

from gaussianmesh_tpu.utils.maths import inv3x3, polar_decompose_rs


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


@functools.partial(jax.jit, static_argnames=())
def deformation_gradients(v_ref: jax.Array, v_def: jax.Array,
                          neighbors: jax.Array, mask: jax.Array,
                          eps: float = 1e-8):
    """-> (R (V,3,3), S (V,3,3)) with T = R @ S the one-ring deformation
    gradient (identity on isolated/degenerate vertices)."""
    e_ref = jnp.where(mask[..., None],
                      v_ref[neighbors] - v_ref[:, None, :], 0.0)  # (V, D, 3)
    e_def = jnp.where(mask[..., None],
                      v_def[neighbors] - v_def[:, None, :], 0.0)

    b = jnp.einsum("vdi,vdj->vij", e_ref, e_ref) + eps * jnp.eye(3)
    a = jnp.einsum("vdi,vdj->vij", e_def, e_ref)
    b_inv, _ = inv3x3(b)   # closed form — batched LU on TPU is scalar-bound
    t = a @ b_inv                                  # T = A B^{-1}
    # degenerate rings (near-zero B) -> identity transform
    scale = jnp.einsum("vdi,vdi->v", e_ref, e_ref)
    t = jnp.where((scale > 1e-12)[:, None, None], t, jnp.eye(3))
    return polar_decompose_rs(t)


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
