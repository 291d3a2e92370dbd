"""Render orchestration: model pytrees -> rasterizer inputs -> image.

Functional replacement for the reference renderer layer
(/root/reference/gaussian_renderer/__init__.py:26-260, `render` and
`bg_render`). SH->RGB and scale/quat->covariance always run on-device as
fused jnp (the reference's `convert_SHs_python` / `compute_cov3D_python`
split is a CUDA-vs-python toggle that has no TPU analog — XLA fuses both
into the preprocess pipeline).

Foreground/background compositing follows the reference: the two models'
arrays are concatenated before binning (render:100-121 for frozen bg,
bg_render:221-232 for frozen fg via stop_grad), so depth sorting
interleaves them correctly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.models import gaussians as gs
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.ops.preprocess import CameraArrays
from gaussianmesh_tpu.ops.rasterize import RasterizeOut, RasterizerConfig, rasterize
from gaussianmesh_tpu.utils import sh as sh_utils


class GaussianArrays(NamedTuple):
    """Rasterizer-ready per-Gaussian arrays (post activations + SH eval)."""
    xyz: jax.Array       # (N, 3)
    cov6: jax.Array      # (N, 6)
    opacity: jax.Array   # (N,)
    rgb: jax.Array       # (N, 3)
    active: jax.Array    # (N,) bool


def mesh_model_arrays(p: mgs.MeshGaussianParams, b: mgs.MeshBinding,
                      cam: CameraArrays, sh_degree: int,
                      scaling_modifier: float = 1.0) -> GaussianArrays:
    xyz = mgs.get_xyz(p, b)
    rgb, _ = sh_utils.eval_sh_color(mgs.get_features(p), xyz, cam.campos, sh_degree)
    return GaussianArrays(
        xyz=xyz,
        cov6=mgs.get_covariance6(p, scaling_modifier),
        opacity=mgs.get_opacity(p)[:, 0],
        rgb=rgb,
        active=b.alive,
    )


def gaussian_model_arrays(p: gs.GaussianParams, state_alive: jax.Array,
                          cam: CameraArrays, sh_degree: int,
                          scaling_modifier: float = 1.0) -> GaussianArrays:
    rgb, _ = sh_utils.eval_sh_color(gs.get_features(p), p.xyz, cam.campos, sh_degree)
    return GaussianArrays(
        xyz=p.xyz,
        cov6=gs.get_covariance6(p, scaling_modifier),
        opacity=gs.get_opacity(p)[:, 0],
        rgb=rgb,
        active=state_alive,
    )


def freeze(a: GaussianArrays) -> GaussianArrays:
    """stop_grad a model that is composited but not trained
    (bg_render's frozen mesh model, gaussian_renderer/__init__.py:221-232)."""
    return jax.tree.map(jax.lax.stop_gradient, a)


def concat_arrays(a: GaussianArrays, b: GaussianArrays) -> GaussianArrays:
    return GaussianArrays(*(jnp.concatenate([x, y], axis=0) for x, y in zip(a, b)))


def render(arrays: GaussianArrays, cam: CameraArrays, cfg: RasterizerConfig,
           bg_color: jax.Array,
           mean2d_offset: jax.Array | None = None) -> RasterizeOut:
    return rasterize(arrays.xyz, arrays.cov6, arrays.opacity, arrays.rgb,
                     bg_color, cam, cfg, mean2d_offset=mean2d_offset,
                     active_mask=arrays.active)
