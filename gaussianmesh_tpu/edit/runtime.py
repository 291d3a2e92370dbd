"""Real-time deformation playback — the edittool runtime, TPU-first.

Reference model (edittool/__init__.py): a SingleObjectDeform binds a
trained mesh-Gaussian PLY to its origin proxy mesh (triangle from the
saved `fid`, area barycentric weights of the on-surface projection); per
frame, per-vertex deformation-gradient factors (R, S) from the
ACAP-equivalent are barycentrically interpolated per Gaussian:

    dpos  = sum_i w_i (v'_i - v_i)
    Rhat  = sum_i w_i R_i
    Shat  = sum_i w_i S_i
    A     = Rhat Shat ;  cov' = A cov A^T ;  pos' = pos + dpos

(The reference transposes its interpolated rotation (:121-122); with its
native GetRS blob missing, that transpose reads as compensation for the
library's row-major 9-float flattening — a rigid rotation Q must carry
cov -> Q cov Q^T, which is what the formula above yields with our own
deformation gradients, and the rigid-motion test asserts it.)

Rendering differences from the reference: our rasterizer consumes
covariances directly, so the eigh -> (scale, quat) round-trip
(edittool/__init__.py:204-207) disappears; SH is evaluated at
view directions rotated into the undeformed frame (Rhat^T d) — which the
reference computes but then bypasses by rasterizing raw SH through the
eigh path (:184-219, dead `colors_precomp`); we keep the rotation since
it is the geometrically correct treatment of anisotropic radiance under
deformation.

The per-frame hot path (deform + render) is one jitted function.
"""

from __future__ import annotations

import functools
import json
import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from gaussianmesh_tpu.data.cameras import Camera, camera_from_json
from gaussianmesh_tpu.edit.deform import MeshDeformer
from gaussianmesh_tpu.io import gaussian_ply, mesh as mesh_io
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.models import gaussians as gs
from gaussianmesh_tpu.models.render import GaussianArrays, concat_arrays
from gaussianmesh_tpu.ops.preprocess import CameraArrays
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussianmesh_tpu.utils import maths, sh as sh_utils


def barycentric_weights(p, v1, v2, v3):
    """Area-based barycentric coordinates of points on/near their triangle
    (edittool/general_utils.py:73-88)."""
    def area2(a, b, c):
        return jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)

    total = jnp.maximum(area2(v1, v2, v3), 1e-12)
    w1 = area2(p, v2, v3) / total
    w2 = area2(p, v1, v3) / total
    w3 = area2(p, v1, v2) / total
    s = w1 + w2 + w3
    return jnp.stack([w1, w2, w3], axis=-1) / s[..., None]


def _bary_blend(packed: jax.Array, gaussian_tris: jax.Array,
                weights: jax.Array):
    """sum_k w_k packed[tri_k] as explicit per-corner adds: one wide row
    gather (N, 3, C) + elementwise — no (N, 3, C) reduction layout."""
    g = packed[gaussian_tris]                            # (N, 3, C)
    return (weights[:, 0, None] * g[:, 0]
            + weights[:, 1, None] * g[:, 1]
            + weights[:, 2, None] * g[:, 2])             # (N, C)


@functools.partial(jax.jit, static_argnames=())
def transfer_deformation9(v_ref, v_def, rot9, shear9, gaussian_tris, weights,
                          pos0, cov6_0):
    """Barycentric transfer of per-vertex deformation to Gaussians,
    component form throughout (edittool/__init__.py:103-131 semantics):
    dpos = sum w dv; A = (sum w R)(sum w S); cov' = A Sigma A^T.
    Returns (pos (N,3), cov6 (N,6), r_hat9 (N,9) packed).

    All per-vertex fields ride ONE (V, 21) table through a single wide
    row gather (TPU gathers cost per row; three separate gathers at the
    same indices cost 3x)."""
    vtab = jnp.concatenate([v_def - v_ref, maths.m9_to_packed(rot9),
                            maths.m9_to_packed(shear9)], axis=-1)   # (V, 21)
    blended = _bary_blend(vtab, gaussian_tris, weights)             # (N, 21)
    dpos = blended[:, 0:3]
    r_hat = blended[:, 3:12]
    s_hat = blended[:, 12:21]
    a = maths.m9_mul(maths.m9_from_packed(r_hat), maths.m9_from_packed(s_hat))
    cov6 = maths.congruence_sym6(a, cov6_0)
    return pos0 + dpos, cov6, r_hat


@functools.partial(jax.jit, static_argnames=())
def transfer_deformation(v_ref, v_def, rot, shear, gaussian_tris, weights,
                         pos0, cov0_full):
    """Dense-API wrapper kept for external callers: (N,3,3) in/out."""
    pos, cov6, r_hat = transfer_deformation9(
        v_ref, v_def, maths.m9_from_dense(rot), maths.m9_from_dense(shear),
        gaussian_tris, weights, pos0,
        maths.strip_symmetric(cov0_full))
    return pos, maths.unstrip_symmetric(cov6), maths.m9_to_dense(
        maths.m9_from_packed(r_hat))


class ObjectDeformer:
    """A trained mesh-Gaussian object bound to its origin proxy mesh."""

    def __init__(self, gaussian_ply_path: str, origin_mesh_path: str,
                 name: str | None = None, max_sh_degree: int | None = None):
        self.name = name or origin_mesh_path
        params, binding, load_xyz = gaussian_ply.load_mesh_gaussian_ply(
            gaussian_ply_path, max_sh_degree=max_sh_degree)
        max_sh_degree = int(round((params.features_rest.shape[1] + 1) ** 0.5)) - 1
        self.n = load_xyz.shape[0]
        self.pos0 = jnp.asarray(load_xyz)
        self.proj0 = mgs.get_proj_xyz(params, binding)
        self.cov6_0 = mgs.get_covariance6(params)
        self.opacity = mgs.get_opacity(params)[:, 0]
        self.features = mgs.get_features(params)          # (N, K, 3)
        self.sh_degree = max_sh_degree

        v, f = mesh_io.read_triangle_mesh(origin_mesh_path)
        self.deformer = MeshDeformer(v, f)
        fid = np.asarray(binding.fid)[:, 0]
        self.gaussian_tris = jnp.asarray(f[fid])          # (N, 3) vertex ids
        tri_v = v[np.asarray(self.gaussian_tris)]         # (N, 3, 3)
        self.weights = barycentric_weights(
            self.proj0, jnp.asarray(tri_v[:, 0]), jnp.asarray(tri_v[:, 1]),
            jnp.asarray(tri_v[:, 2]))

        # current (deformed) state: cov as (N, 6) uppers, rot as (N, 9)
        # packed row-major
        self.pos = self.pos0
        self.cov6 = self.cov6_0
        self.rot9 = self._identity_rot9()

    def _identity_rot9(self):
        return jnp.broadcast_to(
            jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0, 1], jnp.float32),
            (self.n, 9))

    def deform(self, deformed_mesh_path_or_vertices) -> None:
        if isinstance(deformed_mesh_path_or_vertices, str):
            v_def, _ = mesh_io.read_triangle_mesh(deformed_mesh_path_or_vertices)
        else:
            v_def = deformed_mesh_path_or_vertices
        v_def = jnp.asarray(v_def, jnp.float32)
        from gaussianmesh_tpu.edit.deform import deformation_gradients9
        d = self.deformer
        rot9, shear9 = deformation_gradients9(d.v_ref, v_def, d.neighbors,
                                              d.mask)
        self.pos, self.cov6, self.rot9 = transfer_deformation9(
            d.v_ref, v_def, rot9, shear9, self.gaussian_tris,
            self.weights, self.pos0, self.cov6_0)

    def reset(self) -> None:
        self.pos, self.cov6 = self.pos0, self.cov6_0
        self.rot9 = self._identity_rot9()

    def arrays(self, cam: CameraArrays) -> GaussianArrays:
        d = self.pos - cam.campos
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        # Rhat^T d, component form
        rx, ry, rz = maths.m9_vec(
            maths.m9_t(maths.m9_from_packed(self.rot9)),
            d[:, 0], d[:, 1], d[:, 2])
        d_rot = jnp.stack([rx, ry, rz], axis=-1)
        rgb = jnp.maximum(
            sh_utils.eval_sh(self.features, d_rot, self.sh_degree) + 0.5, 0.0)
        return GaussianArrays(
            xyz=self.pos,
            cov6=self.cov6,
            opacity=self.opacity,
            rgb=rgb,
            active=jnp.ones(self.n, bool),
        )


class SceneEditor:
    """Multi-object editing scene with optional background model
    (SceneVisualTool / ObjectVisualTool equivalent)."""

    def __init__(self, bg_ply_path: str | None = None, max_sh_degree: int = 3):
        self.objects: dict[str, ObjectDeformer] = {}
        self.bg_arrays_fn = None
        if bg_ply_path:
            params, alive = gaussian_ply.load_gaussian_ply(
                bg_ply_path, max_sh_degree=max_sh_degree)
            self._bg_params, self._bg_alive = params, alive
            self._bg_sh_degree = max_sh_degree
        else:
            self._bg_params = None

    def add_object(self, gaussian_ply_path: str, origin_mesh_path: str,
                   name: str | None = None) -> ObjectDeformer:
        obj = ObjectDeformer(gaussian_ply_path, origin_mesh_path, name,
                             max_sh_degree=None)
        self.objects[obj.name] = obj
        return obj

    def deform_object(self, name: str, deformed_mesh) -> None:
        self.objects[name].deform(deformed_mesh)

    def _bg_arrays(self, cam: CameraArrays) -> GaussianArrays | None:
        if self._bg_params is None:
            return None
        from gaussianmesh_tpu.models.render import gaussian_model_arrays
        return gaussian_model_arrays(self._bg_params, self._bg_alive, cam,
                                     self._bg_sh_degree)

    def render(self, cam: Camera | CameraArrays, cfg: RasterizerConfig,
               bg_color=None):
        cam_arrays = cam.arrays() if isinstance(cam, Camera) else cam
        arrays = None
        for obj in self.objects.values():
            a = obj.arrays(cam_arrays)
            arrays = a if arrays is None else concat_arrays(arrays, a)
        bg_a = self._bg_arrays(cam_arrays)
        if bg_a is not None:
            arrays = bg_a if arrays is None else concat_arrays(arrays, bg_a)
        if arrays is None:
            raise ValueError(
                "SceneEditor.render: no objects and no background model — "
                "add_object() or construct with bg_ply_path first")
        bg_color = jnp.zeros(3) if bg_color is None else jnp.asarray(bg_color)
        return rasterize(arrays.xyz, arrays.cov6, arrays.opacity, arrays.rgb,
                         bg_color, cam_arrays, cfg, active_mask=arrays.active)

    @staticmethod
    def cameras_from_json(model_path: str) -> list[Camera]:
        """Load <model>/cameras.json (edittool/__init__.py:300-337)."""
        with open(os.path.join(model_path, "cameras.json")) as f:
            entries = json.load(f)
        return [camera_from_json(e) for e in entries]


def deformed_object_arrays(obj: ObjectDeformer, v_def: jax.Array,
                           cam_arrays: CameraArrays) -> GaussianArrays:
    """The per-frame deformation math as a pure function of the deformed
    vertices: one-ring deformation gradients -> barycentric R/S transfer
    -> SH at deformation-rotated view directions. Shared by the fused
    single-chip playback fn and the sharded playback step."""
    from gaussianmesh_tpu.edit.deform import deformation_gradients9

    d = obj.deformer
    rot9, shear9 = deformation_gradients9(d.v_ref, v_def, d.neighbors,
                                          d.mask)
    pos, cov6, r_hat = transfer_deformation9(
        d.v_ref, v_def, rot9, shear9, obj.gaussian_tris, obj.weights,
        obj.pos0, obj.cov6_0)
    dirs = pos - cam_arrays.campos
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    rx, ry, rz = maths.m9_vec(maths.m9_t(maths.m9_from_packed(r_hat)),
                              dirs[:, 0], dirs[:, 1], dirs[:, 2])
    d_rot = jnp.stack([rx, ry, rz], axis=-1)
    rgb = jnp.maximum(
        sh_utils.eval_sh(obj.features, d_rot, obj.sh_degree) + 0.5, 0.0)
    return GaussianArrays(xyz=pos, cov6=cov6, opacity=obj.opacity, rgb=rgb,
                          active=jnp.ones(obj.n, bool))


def make_playback_fn(obj: ObjectDeformer, cam_arrays: CameraArrays,
                     cfg: RasterizerConfig, bg_color=None):
    """Fuse deform + transfer + SH + rasterize into ONE jitted function
    (deformed vertices in, image out) — the per-frame hot path of
    BASELINE config 3. Amortizes dispatch and lets XLA overlap the
    mesh-sized deformation math with the rasterization pipeline.

    Cached per (camera identity, cfg, bg): rebuilding the closure on
    every call would mint a fresh jit cache entry, so repeated playback
    calls would RECOMPILE the whole frame pipeline (the round-3 config-3
    6 fps mis-measurement — compile time inside the timing window)."""
    return _playback_fns(obj, cam_arrays, cfg, bg_color)[0]


def make_composite_playback_fn(editor: "SceneEditor", obj_name: str,
                               cam_arrays: CameraArrays,
                               cfg: RasterizerConfig, bg_color=None,
                               static_cfg: RasterizerConfig | None = None):
    """BASELINE config-5 fast path: one object deforms against a scene
    of static objects + background. The static part's (tile, depth,
    gid) pair domain is pre-expanded ONCE per camera
    (ops.rasterize.precompute_static_pairs) and merged into each
    frame's dynamic expansion at the pair level — the reference re-runs
    its whole pipeline on the concatenated scene every frame
    (/root/reference/edittool/__init__.py:158-231). Returns a jitted
    frame fn (deformed vertices in, (3, H, W) image out). NOT cached:
    callers hold onto it for the sequence (the editor's object set and
    the camera are baked in at build time)."""
    from gaussianmesh_tpu.ops.rasterize import (precompute_static_pairs,
                                                rasterize_composite)
    obj = editor.objects[obj_name]
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
    if static_arrays is None:        # single object: plain playback fn
        return make_playback_fn(obj, cam_arrays, cfg, bg_color)
    bg = jnp.zeros(3) if bg_color is None else jnp.asarray(bg_color)
    # static_cfg lets callers size the STATIC pair-domain capacity to its
    # measured load (the static set's pairs are known at build time; an
    # oversized capacity makes every frame's blend walk dead blocks —
    # overflow stays counted via the frame outputs)
    if static_cfg is not None:
        assert static_cfg.grid == cfg.grid, (static_cfg.grid, cfg.grid)
    static = jax.jit(precompute_static_pairs, static_argnames=("cfg",))(
        static_arrays.xyz, static_arrays.cov6, static_arrays.opacity,
        static_arrays.rgb, cam_arrays, static_cfg or cfg,
        active_mask=static_arrays.active)

    @jax.jit
    def frame_fn(v_def):
        arrays = deformed_object_arrays(obj, v_def, cam_arrays)
        out = rasterize_composite(arrays.xyz, arrays.cov6, arrays.opacity,
                                  arrays.rgb, bg, cam_arrays, cfg, static,
                                  active_mask=arrays.active)
        return out.color

    return frame_fn


_PLAYBACK_CACHE_MAX = 8  # distinct (camera, cfg, bg) closures kept per object


def _playback_fns(obj, cam_arrays, cfg, bg_color):
    """Cached jitted frame closures.

    The closures capture obj.features / obj.opacity at first trace:
    replacing those attributes in place serves stale renders until
    `obj._playback_cache.clear()`. The cache is bounded (oldest entry
    evicted past _PLAYBACK_CACHE_MAX) so an interactive orbit that mints
    a fresh CameraArrays per viewpoint cannot grow retained compiled
    executables without bound."""
    bg_key = (None if bg_color is None
              else tuple(float(x) for x in jnp.asarray(bg_color)))
    key = (id(cam_arrays), cfg, bg_key)
    cache = obj.__dict__.setdefault("_playback_cache", {})
    hit = cache.get(key)
    # the cached entry keeps a strong ref to its camera, so the id key
    # can never alias a collected object; an `is` check makes the id
    # collision case (different live camera, same id — impossible while
    # the ref is held) fail closed
    if hit is not None and hit[0] is cam_arrays:
        # refresh insertion order on hit (LRU, not FIFO): an interactive
        # loop ping-ponging among > _PLAYBACK_CACHE_MAX cameras must not
        # evict its hottest entry and recompile every frame
        cache.pop(key)
        cache[key] = hit
        return hit[1], hit[2]
    while len(cache) >= _PLAYBACK_CACHE_MAX:  # evict least-recently-used
        cache.pop(next(iter(cache)))
    bg = jnp.zeros(3) if bg_color is None else jnp.asarray(bg_color)

    @jax.jit
    def frame_fn(v_def):
        arrays = deformed_object_arrays(obj, v_def, cam_arrays)
        out = rasterize(arrays.xyz, arrays.cov6, arrays.opacity, arrays.rgb,
                        bg, cam_arrays, cfg, active_mask=arrays.active)
        return out.color

    @jax.jit
    def run_batch(vs):
        return jax.lax.map(frame_fn, vs)

    cache[key] = (cam_arrays, frame_fn, run_batch)
    return frame_fn, run_batch


def playback_sequence(obj: ObjectDeformer, cam_arrays: CameraArrays,
                      cfg: RasterizerConfig, vertex_frames: jax.Array,
                      bg_color=None, batch: int = 8) -> jax.Array:
    """Render a whole mesh-sequence on device: (F, V, 3) deformed vertex
    frames -> (F, 3, H, W) images, `batch` frames per dispatch (one
    lax.scan each) so relay/dispatch latency amortizes — the
    mesh-sequence playback measurement path (BASELINE config 3)."""
    _, run_batch = _playback_fns(obj, cam_arrays, cfg, bg_color)

    f = vertex_frames.shape[0]
    outs = []
    for i in range(0, f, batch):
        chunk = vertex_frames[i:i + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad, 0)])
        outs.append(run_batch(chunk)[:batch - pad if pad else batch])
    return jnp.concatenate(outs, axis=0)
