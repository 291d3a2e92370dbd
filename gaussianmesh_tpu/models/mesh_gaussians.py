"""Mesh-bound Gaussian model — the core novelty of GaussianMesh.

Functional redesign of the reference `MeshBasedGaussianModel`
(/root/reference/scene/mesh_based_gaussian_model.py). Each Gaussian lives
on a proxy-mesh triangle via pre-softmax barycentric logits `bc` and a
pre-sigmoid signed offset `distance` along the face normal; the position
law (mesh_based_gaussian_model.py:139-152) is

    xyz = softmax(bc) . [v1; v2; v3]
          + alpha_distance * r * (sigmoid(distance) - 0.5) * normal

with alpha_distance = 4 and r the face's mean edge length. Attachment
state (corner coords, vertex indices, original face id, normal, r) is
non-trainable and carried per Gaussian so densify-by-subdivision never
needs mesh connectivity.

Static-capacity pytree with `alive` mask (JAX-first; the reference resizes
tensors and performs Adam-state surgery instead — SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gaussianmesh_tpu.ops.knn import mean_sq_dist3
from gaussianmesh_tpu.utils import maths, sh as sh_utils, subdivision

ALPHA_DISTANCE = 4.0  # mesh_based_gaussian_model.py:48


@struct.dataclass
class MeshGaussianParams:
    """Trainable leaves (capacity C rows)."""
    bc: jax.Array             # (C, 3) pre-softmax barycentric logits
    distance: jax.Array       # (C, 1) pre-sigmoid normal offset
    features_dc: jax.Array    # (C, 1, 3)
    features_rest: jax.Array  # (C, K-1, 3)
    scaling: jax.Array        # (C, 3) log-scale
    rotation: jax.Array       # (C, 4)
    opacity: jax.Array        # (C, 1) pre-sigmoid


@struct.dataclass
class MeshBinding:
    """Non-trainable attachment state, one row per Gaussian."""
    vertex1: jax.Array        # (C, 3)
    vertex2: jax.Array        # (C, 3)
    vertex3: jax.Array        # (C, 3)
    vertex_index: jax.Array   # (C, 3) int32 into the (growing) proxy mesh
    fid: jax.Array            # (C, 1) int32 ORIGINAL face id (pre-split)
    normal: jax.Array         # (C, 3)
    r: jax.Array              # (C, 1) mean edge length
    alive: jax.Array          # (C,) bool


@struct.dataclass
class MeshVertices:
    """The (subdividing) proxy mesh vertex pool, fixed capacity."""
    v: jax.Array              # (VC, 3)
    count: jax.Array          # () int32 — valid prefix length


@struct.dataclass
class MeshGaussianState:
    max_radii2d: jax.Array
    grad_accum: jax.Array     # accumulated ||dL/d mean2d|| (bc gradient stats)
    denom: jax.Array


def get_bc(p: MeshGaussianParams) -> jax.Array:
    return jax.nn.softmax(p.bc, axis=1)


def get_xyz(p: MeshGaussianParams, b: MeshBinding) -> jax.Array:
    bc = get_bc(p)
    proj = (bc[:, 0:1] * b.vertex1 + bc[:, 1:2] * b.vertex2
            + bc[:, 2:3] * b.vertex3)
    offset = ALPHA_DISTANCE * b.r * (jax.nn.sigmoid(p.distance) - 0.5) * b.normal
    return proj + offset


def get_proj_xyz(p: MeshGaussianParams, b: MeshBinding) -> jax.Array:
    bc = get_bc(p)
    return bc[:, 0:1] * b.vertex1 + bc[:, 1:2] * b.vertex2 + bc[:, 2:3] * b.vertex3


def get_scaling(p: MeshGaussianParams) -> jax.Array:
    return jnp.exp(p.scaling)


def get_opacity(p: MeshGaussianParams) -> jax.Array:
    return jax.nn.sigmoid(p.opacity)


def get_features(p: MeshGaussianParams) -> jax.Array:
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def get_covariance6(p: MeshGaussianParams, scaling_modifier: float = 1.0) -> jax.Array:
    return maths.covariance_6(get_scaling(p), maths.normalize(p.rotation),
                              scaling_modifier)


def empty_state(capacity: int) -> MeshGaussianState:
    z = jnp.zeros(capacity, jnp.float32)
    return MeshGaussianState(max_radii2d=z, grad_accum=z, denom=z)


def create_from_mesh(vertices: jax.Array, triangles: jax.Array, capacity: int,
                     vertex_capacity: int, max_sh_degree: int = 3,
                     rng: jax.Array | None = None
                     ) -> tuple[MeshGaussianParams, MeshBinding, MeshVertices,
                                MeshGaussianState]:
    """One Gaussian per face (mesh_based_gaussian_model.py:183-241):
    bc logits = 1/3 (uniform), distance = 0 (on-surface), random DC color,
    scale from mean 3-NN distance of face centroids, opacity 0.1."""
    n = triangles.shape[0]
    assert capacity >= n and vertex_capacity >= vertices.shape[0]
    k = (max_sh_degree + 1) ** 2
    rng = jax.random.PRNGKey(0) if rng is None else rng

    v1 = vertices[triangles[:, 0]].astype(jnp.float32)
    v2 = vertices[triangles[:, 1]].astype(jnp.float32)
    v3 = vertices[triangles[:, 2]].astype(jnp.float32)
    normals = subdivision.face_normals(v1, v2, v3)
    r = subdivision.face_mean_edge_length(v1, v2, v3)

    centroid = (v1 + v2 + v3) / 3.0
    dist2 = jnp.clip(mean_sq_dist3(centroid), 1e-7, None)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    colors = jax.random.uniform(rng, (n, 3))

    def cap(x, fill=0.0, dtype=None):
        pad = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        out = jnp.pad(x, pad, constant_values=fill)
        return out.astype(dtype) if dtype else out

    params = MeshGaussianParams(
        bc=cap(jnp.full((n, 3), 1.0 / 3.0, jnp.float32)),
        distance=jnp.zeros((capacity, 1), jnp.float32),
        features_dc=cap(sh_utils.rgb_to_sh(colors)[:, None, :]),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=cap(log_scale),
        rotation=cap(jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))),
        opacity=cap(maths.inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))),
    )
    binding = MeshBinding(
        vertex1=cap(v1), vertex2=cap(v2), vertex3=cap(v3),
        vertex_index=cap(triangles.astype(jnp.int32)),
        fid=cap(jnp.arange(n, dtype=jnp.int32)[:, None]),
        normal=cap(normals), r=cap(r),
        alive=jnp.arange(capacity) < n,
    )
    vpad = jnp.zeros((vertex_capacity - vertices.shape[0], 3), jnp.float32)
    mesh_v = MeshVertices(
        v=jnp.concatenate([vertices.astype(jnp.float32), vpad]),
        count=jnp.int32(vertices.shape[0]),
    )
    return params, binding, mesh_v, empty_state(capacity)
