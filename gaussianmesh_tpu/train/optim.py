"""Per-group Adam with scheduled learning rates (optax).

Reproduces the reference training_setup
(/root/reference/scene/mesh_based_gaussian_model.py:243-262 and
scene/gaussian_model.py:163-181): Adam(eps=1e-15) with per-parameter-group
lrs; position-like params (bc+distance / xyz) follow the exponential
log-lerp schedule scaled by the scene extent. Implemented as one
GradientTransformation whose update scales each pytree leaf by a
per-leaf lr evaluated from the step counter — jit-friendly and
compaction-friendly (Adam moments live in a plain ScaleByAdamState whose
mu/nu trees mirror the params, so densify can scatter them directly).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gaussianmesh_tpu.config import OptimizationParams
from gaussianmesh_tpu.models.gaussians import GaussianParams
from gaussianmesh_tpu.models.mesh_gaussians import MeshGaussianParams
from gaussianmesh_tpu.utils.lr import expon_lr


class OptState(NamedTuple):
    adam: optax.ScaleByAdamState
    step: jax.Array


def make_optimizer(lr_tree_fn: Callable) -> optax.GradientTransformation:
    """lr_tree_fn(step) -> pytree of scalar lrs matching the params tree."""
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)

    def init(params):
        return OptState(adam=adam.init(params), step=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        updates, adam_state = adam.update(grads, state.adam, params)
        lrs = lr_tree_fn(state.step)
        updates = jax.tree.map(lambda u, lr: -lr * u, updates, lrs)
        return updates, OptState(adam=adam_state, step=state.step + 1)

    return optax.GradientTransformation(init, update)


def mesh_lr_tree_fn(opt: OptimizationParams, spatial_lr_scale: float):
    def fn(step):
        pos_lr = expon_lr(step,
                          opt.position_lr_init * spatial_lr_scale,
                          opt.position_lr_final * spatial_lr_scale,
                          lr_delay_mult=opt.position_lr_delay_mult,
                          max_steps=opt.position_lr_max_steps)
        return MeshGaussianParams(
            bc=pos_lr,
            distance=pos_lr,
            features_dc=jnp.float32(opt.feature_lr),
            features_rest=jnp.float32(opt.feature_lr / 20.0),
            scaling=jnp.float32(opt.scaling_lr),
            rotation=jnp.float32(opt.rotation_lr),
            opacity=jnp.float32(opt.opacity_lr),
        )
    return fn


def gaussian_lr_tree_fn(opt: OptimizationParams, spatial_lr_scale: float):
    def fn(step):
        pos_lr = expon_lr(step,
                          opt.position_lr_init * spatial_lr_scale,
                          opt.position_lr_final * spatial_lr_scale,
                          lr_delay_mult=opt.position_lr_delay_mult,
                          max_steps=opt.position_lr_max_steps)
        return GaussianParams(
            xyz=pos_lr,
            features_dc=jnp.float32(opt.feature_lr),
            features_rest=jnp.float32(opt.feature_lr / 20.0),
            scaling=jnp.float32(opt.scaling_lr),
            rotation=jnp.float32(opt.rotation_lr),
            opacity=jnp.float32(opt.opacity_lr),
        )
    return fn
