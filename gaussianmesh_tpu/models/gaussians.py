"""Vanilla 3DGS parameter store (used as the background model).

Functional redesign of the reference `GaussianModel`
(/root/reference/scene/gaussian_model.py): a struct-of-arrays pytree with a
fixed capacity and an `alive` mask instead of dynamically-resized tensors.
Activations mirror the reference (scaling=exp, opacity=sigmoid,
rotation=L2-normalize); adaptive density control lives in
gaussianmesh_tpu.train.densify as masked compaction, not optimizer surgery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gaussianmesh_tpu.ops.knn import mean_sq_dist3
from gaussianmesh_tpu.utils import maths, sh as sh_utils


@struct.dataclass
class GaussianParams:
    """Trainable leaves. Capacity C rows; dead rows are arbitrary values."""
    xyz: jax.Array            # (C, 3)
    features_dc: jax.Array    # (C, 1, 3)
    features_rest: jax.Array  # (C, K-1, 3)
    scaling: jax.Array        # (C, 3) log-scale
    rotation: jax.Array       # (C, 4) unnormalized quat (w, x, y, z)
    opacity: jax.Array        # (C, 1) pre-sigmoid


@struct.dataclass
class GaussianState:
    """Non-trainable per-Gaussian state."""
    alive: jax.Array               # (C,) bool
    max_radii2d: jax.Array         # (C,) float32
    grad_accum: jax.Array          # (C,) accumulated ||dL/d mean2d||
    denom: jax.Array               # (C,) observation counts


def n_alive(state: GaussianState) -> jax.Array:
    return jnp.sum(state.alive)


def get_scaling(p: GaussianParams) -> jax.Array:
    return jnp.exp(p.scaling)


def get_opacity(p: GaussianParams) -> jax.Array:
    return jax.nn.sigmoid(p.opacity)


def get_rotation(p: GaussianParams) -> jax.Array:
    return maths.normalize(p.rotation)


def get_features(p: GaussianParams) -> jax.Array:
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)  # (C, K, 3)


def get_covariance6(p: GaussianParams, scaling_modifier: float = 1.0) -> jax.Array:
    return maths.covariance_6(get_scaling(p), get_rotation(p), scaling_modifier)


def empty_state(capacity: int) -> GaussianState:
    return GaussianState(
        alive=jnp.zeros(capacity, bool),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )


def create_from_points(points: jax.Array, colors: jax.Array, capacity: int,
                       max_sh_degree: int = 3) -> tuple[GaussianParams, GaussianState]:
    """SfM-point initialization (reference gaussian_model.py:124-161):
    scale from sqrt(mean 3-NN squared distance), opacity 0.1, identity quat,
    DC color from RGB."""
    n = points.shape[0]
    assert capacity >= n, (capacity, n)
    k = (max_sh_degree + 1) ** 2

    dist2 = jnp.clip(mean_sq_dist3(points), 1e-7, None)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def cap(x, fill=0.0):
        pad = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    params = GaussianParams(
        xyz=cap(points.astype(jnp.float32)),
        features_dc=cap(sh_utils.rgb_to_sh(colors.astype(jnp.float32))[:, None, :]),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=cap(log_scale),
        rotation=cap(jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))),
        opacity=cap(maths.inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))),
    )
    state = empty_state(capacity)
    state = state.replace(alive=jnp.arange(capacity) < n)
    return params, state
