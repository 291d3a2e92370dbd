"""gaussianmesh_tpu — TPU-native mesh-bound 3D Gaussian splatting.

A from-scratch JAX / XLA / Pallas framework with the capabilities of
IGLICT/GaussianMesh ("Real-time Large-scale Deformation of Gaussian
Splatting"): a differentiable tile-based Gaussian rasterizer, a mesh-bound
Gaussian model (barycentric face attachment + normal offset), training with
densify-by-subdivision, background-model compositing, and a real-time edit
runtime driven by per-vertex deformation gradients — sharded across TPU
device meshes with `jax.sharding` / `shard_map`.

Design stance (see SURVEY.md §7): not a port. Struct-of-arrays pytrees,
pure functions, static shapes with capacity+mask, alpha blending expressed
as exclusive cumulative log-transmittance + weight matmuls (associative and
deterministic — no atomics), and Pallas kernels for the per-tile hot loop.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (projection, covariance chains) needs true f32 contractions; the
# TPU MXU otherwise runs bf16 passes under DEFAULT precision. Hot kernels
# that can tolerate bf16 opt in explicitly with preferred_element_type.
_jax.config.update("jax_default_matmul_precision", "highest")

from gaussianmesh_tpu import utils, ops  # noqa: F401
