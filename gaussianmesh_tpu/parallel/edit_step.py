"""Sharded real-time edit playback: shard_map over ("data", "tile").

The reference's edit loop is single-GPU (edittool/__init__.py, SURVEY.md
§2.15); this is the multi-chip equivalent for large multi-object scenes
(BASELINE config 5 — garden/excavator-style scene edits). Per dispatch:

  - the DATA axis parallelizes FRAMES of the mesh sequence: each data
    group deforms and renders a different frame (frames are independent,
    so this axis is embarrassingly parallel — it multiplies playback
    throughput, while the tile axis divides per-frame latency);
  - within a data group, the TILE axis shards the image into contiguous
    horizontal tile bands: every device runs the mesh-sized deformation
    (one-ring gradients + barycentric transfer, vertex-count work —
    cheap, replicated) and the Gaussian-sized preprocess, then bins,
    sorts and blends ONLY its band — the pixel-proportional hot path.

No collectives appear in the forward path at all: deformation and
preprocess are replicated compute, band outputs are disjoint, and the
final (F, 3, H, W) image is materialized by the output sharding itself.
That makes the scaling profile pure compute-division over ICI-local
work (the all-gather of band images to the host happens only if the
caller devices->host transfers the frames).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussianmesh_tpu.models.render import concat_arrays
from gaussianmesh_tpu.ops.preprocess import TILE, CameraArrays
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.parallel.sharding import DATA_AXIS, TILE_AXIS
from gaussianmesh_tpu.parallel.train_step import rasterize_band


def make_sharded_playback_fn(mesh: Mesh, editor, obj_name: str,
                             cam_arrays: CameraArrays, cfg: RasterizerConfig,
                             bg_color=None, height_valid: int | None = None):
    """Returns playback(v_frames (F, V, 3)) -> (F, 3, H_valid, W) with
    F == mesh.shape["data"] frames rendered per dispatch.

    `editor` is a SceneEditor; `obj_name` selects the deformable object
    (the reference deforms one object per call, edit.py:38); every other
    object and the optional background model render at their CURRENT
    state, composited exactly like SceneEditor.render.
    `cfg.height` must be padded so the tile grid divides the tile axis;
    rows >= height_valid are cropped from the result.
    """
    from gaussianmesh_tpu.edit.runtime import deformed_object_arrays

    n_data = mesh.shape[DATA_AXIS]
    n_tile = mesh.shape[TILE_AXIS]
    gx, gy = cfg.grid
    assert gy % n_tile == 0, (gy, n_tile)
    gy_local = gy // n_tile
    h_valid = cfg.height if height_valid is None else height_valid
    bg_color = jnp.zeros(3) if bg_color is None else jnp.asarray(bg_color)

    obj = editor.objects[obj_name]
    # static objects + background render at their CURRENT state with a
    # FIXED camera: evaluate their SH once here and close over the result
    # instead of re-deriving it on every device every frame
    static_arrays = None
    for name, other in editor.objects.items():
        if name == obj_name:
            continue
        a = other.arrays(cam_arrays)
        static_arrays = a if static_arrays is None else concat_arrays(
            static_arrays, a)
    bg_a = editor._bg_arrays(cam_arrays)
    if bg_a is not None:
        static_arrays = bg_a if static_arrays is None else concat_arrays(
            static_arrays, bg_a)

    def body(v_def_b):
        v_def = v_def_b[0]                                   # (V, 3)
        arrays = deformed_object_arrays(obj, v_def, cam_arrays)
        if static_arrays is not None:
            arrays = concat_arrays(arrays, static_arrays)
        y0 = jax.lax.axis_index(TILE_AXIS) * gy_local
        out = rasterize_band(arrays, cam_arrays, cfg, gy_local, y0,
                             bg_color)
        return out.color[None]                               # (1, 3, Hb, W)

    body_sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=P(DATA_AXIS, None, None),
        out_specs=P(DATA_AXIS, None, TILE_AXIS, None),
        check_vma=False,
    )

    @jax.jit
    def playback(v_frames: jax.Array) -> jax.Array:
        assert v_frames.shape[0] == n_data, (v_frames.shape, n_data)
        imgs = body_sharded(v_frames)                        # (F, 3, H, W)
        return imgs[:, :, :h_valid, :]

    return playback
