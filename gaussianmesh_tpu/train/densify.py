"""Densification as static-shape masked compaction.

The reference grows/shrinks tensors and performs Adam-state surgery in the
optimizer (scene/mesh_based_gaussian_model.py:411-563, SURVEY.md §2.4) —
impossible under jit. Here every model lives in fixed-capacity arrays with
an `alive` mask; densification is a jitted scatter:

  * mesh model: `densify_and_split` — high-gradient Gaussians' triangles
    are midpoint-subdivided (1->4, or 1->5 keeping a parent copy), children
    written into free slots, parents retired, Adam moments zeroed at the
    new slots, three fresh vertices appended per split face. Mirrors
    densify_and_split(:504-563) including its quirks we keep deliberately:
    children inherit the PARENT's `r` (offset amplitude) and fid; scale
    divided by 4*0.8; bc logits reset to 1/3; distance reset to 0; all
    densification statistics reset to zero afterwards.
  * `split_all_for_init` reuses the same kernel with everything selected
    and N=4 (densify_and_split_for_init:596-647, driven until >100K).

Capacity exhaustion is reported, never silent: callers grow capacity on
the host (one recompile) when `dropped > 0`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.models.mesh_gaussians import (
    MeshBinding, MeshGaussianParams, MeshGaussianState, MeshVertices,
    empty_state)
from gaussianmesh_tpu.utils.subdivision import _CHILD_IDX_CODE, _CHILD_W

LOG_SCALE_SHRINK = jnp.log(4.0 * 0.8)  # scale /= 4*0.8 on split (:544)


class SplitResult(NamedTuple):
    params: MeshGaussianParams
    binding: MeshBinding
    mesh_v: MeshVertices
    mu: MeshGaussianParams        # Adam first moments (same tree)
    nu: MeshGaussianParams        # Adam second moments
    state: MeshGaussianState
    n_split: jax.Array            # () int32 — parents actually split
    dropped: jax.Array            # () int32 — selected but no room


class _Selection(NamedTuple):
    """Parent selection + free-slot plan (pure function of binding/grads)."""
    sel_idx: jax.Array        # (max_split,) candidate rows, grad-descending
    parent_ok: jax.Array      # (max_split,) selected AND has room
    free_idx: jax.Array       # (max_split * nch,) destination slots
    n_split: jax.Array        # () int32
    dropped: jax.Array        # () int32


def _select_parents(binding: MeshBinding, grads_avg: jax.Array,
                    threshold, n_children: int, max_split: int,
                    vroom) -> _Selection:
    """Pick up to max_split highest-gradient parents with room for their
    children (free Gaussian slots) and their 3 midpoint vertices
    (`vroom` = vertex slots available to THIS selection)."""
    c = binding.alive.shape[0]
    nch = n_children

    # --- select parents (highest gradient first, capped at max_split) ----
    scores = jnp.where(binding.alive & (grads_avg >= threshold),
                       grads_avg, -jnp.inf)
    top_scores, sel_idx = jax.lax.top_k(scores, max_split)
    sel_ok = top_scores > -jnp.inf                     # prefix mask

    # --- find free destination slots -------------------------------------
    # ONLY currently-dead slots: a selected-but-dropped parent must keep
    # its row intact, so parents' own slots are never reused within the
    # same pass (they become free on the NEXT pass, after the kill). Reuse
    # here could scatter a child over a still-alive dropped parent.
    free = ~binding.alive
    free_idx = jnp.nonzero(free, size=max_split * nch, fill_value=c)[0]

    # parent j is split only if all nch destination slots exist (free_idx
    # sorted ascending, so checking the last child's slot suffices) AND
    # its 3 midpoint vertices fit the vertex room — a shortage of either
    # shows up in `dropped`, which the trainer answers by growing BOTH
    # buffers and retrying
    last_slot = free_idx[jnp.arange(max_split) * nch + (nch - 1)]
    vertex_ok = 3 * (jnp.arange(max_split) + 1) <= vroom
    parent_ok = sel_ok & (last_slot < c) & vertex_ok
    n_split = jnp.sum(parent_ok)
    dropped = jnp.sum(sel_ok) - n_split
    return _Selection(sel_idx=sel_idx, parent_ok=parent_ok,
                      free_idx=free_idx, n_split=n_split, dropped=dropped)


class _SplitApplied(NamedTuple):
    params: MeshGaussianParams
    binding: MeshBinding
    mu: MeshGaussianParams
    nu: MeshGaussianParams
    state: MeshGaussianState
    mids: jax.Array           # (max_split * 3, 3) midpoint vertices
    vdest: jax.Array          # (max_split * 3,) GLOBAL vertex-pool slots
                              # (vertex_base-offset); _VSENT when unused


_VSENT = jnp.int32(1 << 30)   # vertex scatter sentinel (mode="drop")


def _apply_split(params: MeshGaussianParams, binding: MeshBinding,
                 mu: MeshGaussianParams, nu: MeshGaussianParams,
                 sel: _Selection, n_children: int,
                 vertex_base) -> _SplitApplied:
    """Scatter the selected splits into the (local) capacity arrays.

    `vertex_base` is the GLOBAL vertex-pool id of this call's first new
    vertex — mesh_v.count for the single-table path; under Gaussian-table
    sharding it comes from an exclusive cross-shard scan of n_split so
    shards append to disjoint global ranges. The vertex COORDINATES are
    returned (mids/vdest) instead of scattered, because the pool may be a
    global array the caller owns."""
    c = binding.alive.shape[0]
    nch = n_children

    # --- child geometry ---------------------------------------------------
    k_ids = jnp.arange(sel.sel_idx.shape[0] * nch)
    pj = k_ids // nch                                  # parent rank
    cid = k_ids % nch                                  # child index
    parent = sel.sel_idx[pj]
    ok = sel.parent_ok[pj]
    dest = jnp.where(ok, sel.free_idx[k_ids], c)

    pv1 = binding.vertex1[parent]
    pv2 = binding.vertex2[parent]
    pv3 = binding.vertex3[parent]
    corners = jnp.stack([pv1, pv2, pv3], axis=1)       # (K, 3, 3)
    w = jnp.asarray(_CHILD_W)[cid]                     # (K, 3vert, 3corner)
    child = jnp.einsum("kvc,kcd->kvd", w, corners)     # (K, 3vert, 3)

    # new vertices: 3 per split parent, prefix-packed after vertex_base
    vbase = vertex_base + 3 * pj
    code = jnp.asarray(_CHILD_IDX_CODE)[cid]          # (K, 3)
    parent_vidx = binding.vertex_index[parent]
    child_vidx = jnp.where(code < 3,
                           jnp.take_along_axis(parent_vidx,
                                               jnp.clip(code, 0, 2), axis=1),
                           vbase[:, None] + jnp.clip(code - 3, 0, 2))

    # --- scatter params ---------------------------------------------------
    def scat(arr, child_vals):
        return arr.at[dest].set(child_vals, mode="drop")

    new_params = MeshGaussianParams(
        bc=scat(params.bc, jnp.full((k_ids.shape[0], 3), 1.0 / 3.0)),
        distance=scat(params.distance, jnp.zeros((k_ids.shape[0], 1))),
        features_dc=scat(params.features_dc, params.features_dc[parent]),
        features_rest=scat(params.features_rest, params.features_rest[parent]),
        scaling=scat(params.scaling, params.scaling[parent] - LOG_SCALE_SHRINK),
        rotation=scat(params.rotation, params.rotation[parent]),
        opacity=scat(params.opacity, params.opacity[parent]),
    )

    kill = jnp.zeros(c, bool).at[sel.sel_idx].set(sel.parent_ok, mode="drop")
    alive = (binding.alive & ~kill).at[dest].set(True, mode="drop")

    new_binding = MeshBinding(
        vertex1=scat(binding.vertex1, child[:, 0]),
        vertex2=scat(binding.vertex2, child[:, 1]),
        vertex3=scat(binding.vertex3, child[:, 2]),
        vertex_index=scat(binding.vertex_index, child_vidx.astype(jnp.int32)),
        fid=scat(binding.fid, binding.fid[parent]),
        normal=scat(binding.normal, binding.normal[parent]),
        r=scat(binding.r, binding.r[parent]),
        alive=alive,
    )

    # --- new mesh vertices (midpoints, reference layout m_ab, m_ac, m_bc) -
    mids = jnp.stack([(pv1 + pv2) * 0.5, (pv1 + pv3) * 0.5,
                      (pv2 + pv3) * 0.5], axis=1)      # (K, 3, 3)
    pj_first = (cid == 0) & ok
    vdest = jnp.where(pj_first[:, None],
                      vbase[:, None] + jnp.arange(3)[None, :], _VSENT)
    sel3 = jnp.arange(sel.sel_idx.shape[0]) * nch      # one row per parent
    mids_flat = mids[sel3].reshape(-1, 3)
    vdest_flat = vdest[sel3].reshape(-1)

    new_mu = jax.tree.map(lambda m: m.at[dest].set(0.0, mode="drop"), mu)
    new_nu = jax.tree.map(lambda m: m.at[dest].set(0.0, mode="drop"), nu)

    return _SplitApplied(params=new_params, binding=new_binding,
                         mu=new_mu, nu=new_nu, state=empty_state(c),
                         mids=mids_flat, vdest=vdest_flat)


@functools.partial(jax.jit, static_argnames=("n_children", "max_split"))
def densify_and_split(params: MeshGaussianParams, binding: MeshBinding,
                      mesh_v: MeshVertices, mu: MeshGaussianParams,
                      nu: MeshGaussianParams, state: MeshGaussianState,
                      grads_avg: jax.Array, threshold: float,
                      n_children: int, max_split: int) -> SplitResult:
    sel = _select_parents(binding, grads_avg, threshold, n_children,
                          max_split, vroom=mesh_v.v.shape[0] - mesh_v.count)
    app = _apply_split(params, binding, mu, nu, sel, n_children,
                       vertex_base=mesh_v.count)
    new_v = mesh_v.v.at[app.vdest].set(app.mids, mode="drop")
    new_mesh_v = MeshVertices(v=new_v, count=mesh_v.count + 3 * sel.n_split)
    return SplitResult(
        params=app.params, binding=app.binding, mesh_v=new_mesh_v,
        mu=app.mu, nu=app.nu, state=app.state,
        n_split=sel.n_split, dropped=sel.dropped,
    )


def split_all_for_init(params, binding, mesh_v, mu, nu, state,
                       max_split: int):
    """1->4 split of every alive Gaussian (init loop until >100K)."""
    grads = jnp.where(binding.alive, 1.0, 0.0)
    return densify_and_split(params, binding, mesh_v, mu, nu, state,
                             grads, 0.5, 4, max_split)


def densify_and_split_gauss_sharded(
        mesh, params: MeshGaussianParams, binding: MeshBinding,
        mesh_v: MeshVertices, mu: MeshGaussianParams,
        nu: MeshGaussianParams, state: MeshGaussianState,
        grads_avg: jax.Array, threshold: float, n_children: int,
        max_split_per_shard: int, axis_name: str = "shard") -> SplitResult:
    """Per-shard masked compaction for the Gaussian-table-sharded regime.

    Each shard selects its own top-k parents and compacts into its OWN
    free slots — no cross-shard gather of the table, so the pass scales
    like the sharded train step (O(C/D) per device) instead of pulling
    the whole table through global top_k/nonzero. Only two cross-shard
    exchanges happen, both O(D): an all_gather of per-shard n_split (the
    exclusive scan assigning each shard a disjoint GLOBAL vertex-pool
    range, so `vertex_index` stays globally addressed and save_mesh needs
    no remap) and the psum of the overflow counters. The vertex pool
    itself stays replicated — it is mesh-sized (vertices ~ faces/2), two
    orders smaller than the Gaussian table, and written only here.

    Selection parity vs the single-table `densify_and_split`: identical
    whenever no per-shard cap binds — the reference semantics
    (scene/mesh_based_gaussian_model.py:504-563) select by threshold, and
    a threshold test distributes over shards. Per-shard vertex room is
    budgeted conservatively at (vcap - count) / D, so a shard can report
    `dropped` while global room remains; callers grow and retry exactly
    as in the single-table path.
    """
    d = mesh.shape[axis_name]
    c = binding.alive.shape[0]
    assert c % d == 0, (c, d)
    # top_k needs k <= local rows; callers may pass the global budget
    max_split_per_shard = min(max_split_per_shard, c // d)
    vcap = mesh_v.v.shape[0]
    from jax.sharding import PartitionSpec as P

    def body(p, b, mu_, nu_, g, count):
        my = jax.lax.axis_index(axis_name)
        sel = _select_parents(b, g, threshold, n_children,
                              max_split_per_shard,
                              vroom=(vcap - count) // d)
        all_n = jax.lax.all_gather(sel.n_split, axis_name)       # (D,)
        base = count + 3 * jnp.sum(
            jnp.where(jnp.arange(d) < my, all_n, 0))
        app = _apply_split(p, b, mu_, nu_, sel, n_children,
                           vertex_base=base)
        n_total = jnp.sum(all_n)
        dropped = jax.lax.psum(sel.dropped, axis_name)
        return (app.params, app.binding, app.mu, app.nu, app.state,
                app.mids, app.vdest, n_total, dropped)

    shard = P(axis_name)
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(shard, shard, shard, shard, shard, P()),
        out_specs=(shard, shard, shard, shard, shard, shard, shard,
                   P(), P()),
        check_vma=False,
    )(params, binding, mu, nu, grads_avg, mesh_v.count)
    (new_params, new_binding, new_mu, new_nu, new_state,
     mids, vdest, n_split, dropped) = out

    new_v = mesh_v.v.at[vdest].set(mids, mode="drop")
    new_mesh_v = MeshVertices(v=new_v, count=mesh_v.count + 3 * n_split)
    return SplitResult(params=new_params, binding=new_binding,
                       mesh_v=new_mesh_v, mu=new_mu, nu=new_nu,
                       state=new_state, n_split=n_split, dropped=dropped)


def reset_opacity(params):
    """opacity <- min(opacity, 0.01) in activated space, every 3000 iters
    (mesh_based_gaussian_model.py:334-339; gaussian_model.py:240-245).
    Works for both param types (only touches .opacity). The reference
    also zeroes the Adam moments of opacity on reset
    (replace_tensor_to_optimizer, gaussian_model.py:290-301) — callers do
    that on their optimizer state."""
    op = jax.nn.sigmoid(params.opacity)
    new = jnp.log(jnp.minimum(op, 0.01) / (1.0 - jnp.minimum(op, 0.01)))
    return params.replace(opacity=new)


def add_densification_stats(state: MeshGaussianState, mean2d_grad: jax.Array,
                            visibility: jax.Array, width: int,
                            height: int) -> MeshGaussianState:
    """Accumulate ||dL/d mean2d|| in the reference's NDC-half units
    (pixel-grad x (W/2, H/2) — backward.cu:460-461), over visible only."""
    scaled = mean2d_grad * jnp.array([0.5 * width, 0.5 * height])
    norm = jnp.linalg.norm(scaled, axis=-1)
    return state.replace(
        grad_accum=state.grad_accum + jnp.where(visibility, norm, 0.0),
        denom=state.denom + visibility.astype(jnp.float32),
    )


def grads_avg(state: MeshGaussianState) -> jax.Array:
    g = state.grad_accum / jnp.maximum(state.denom, 1.0)
    return jnp.nan_to_num(g, nan=0.0)


# ---------------------------------------------------------------------------
# Vanilla 3DGS adaptive density control (background model)
# ---------------------------------------------------------------------------
# Reference: scene/gaussian_model.py:373-427 — clone small high-gradient
# Gaussians, split large ones into N=2 resampled children (scale / 1.6),
# prune by opacity (and optionally screen/world size). Same masked
# compaction machinery as the mesh model.

from gaussianmesh_tpu.models.gaussians import (GaussianParams, GaussianState,
                                               empty_state as gs_empty_state)
from gaussianmesh_tpu.utils.maths import quat_to_rotmat


class BgDensifyResult(NamedTuple):
    params: GaussianParams
    mu: GaussianParams
    nu: GaussianParams
    state: GaussianState
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array
    dropped: jax.Array


@functools.partial(jax.jit, static_argnames=("max_new",))
def densify_and_prune_bg(params: GaussianParams, state: GaussianState,
                         mu: GaussianParams, nu: GaussianParams,
                         grads_avg: jax.Array, rng: jax.Array,
                         grad_threshold: float, min_opacity: float,
                         extent: float, percent_dense: float,
                         max_screen: float, max_new: int) -> BgDensifyResult:
    """Clone + split (N=2) + prune in one jitted compaction pass.

    `max_screen` <= 0 disables the screen/world-size prune (the reference
    passes size_threshold=None in bg training, train_bg_gaussian.py:148)."""
    c = state.alive.shape[0]
    max_scale = jnp.max(jnp.exp(params.scaling), axis=1)

    hot = state.alive & (grads_avg >= grad_threshold)
    clone_sel = hot & (max_scale <= percent_dense * extent)
    split_sel = hot & (max_scale > percent_dense * extent)

    # candidates ranked by gradient, capped at max_new slots total
    score = jnp.where(clone_sel | split_sel, grads_avg, -jnp.inf)
    top_score, cand = jax.lax.top_k(score, max_new)
    cand_ok = top_score > -jnp.inf
    cand_is_split = split_sel[cand]

    # each clone needs 1 new slot, each split needs 2 (parent retired)
    free = ~state.alive
    free_idx = jnp.nonzero(free, size=2 * max_new, fill_value=c)[0]
    need = jnp.where(cand_ok, jnp.where(cand_is_split, 2, 1), 0)
    slot0 = jnp.cumsum(need) - need                       # first slot per cand
    have_room = (slot0 + need) <= jnp.sum(free)
    ok = cand_ok & have_room
    n_cloned = jnp.sum(ok & ~cand_is_split)
    n_split = jnp.sum(ok & cand_is_split)
    dropped = jnp.sum(cand_ok) - jnp.sum(ok)

    # child slots: k-th new row for candidate i at free_idx[slot0[i] + k]
    k_ids = jnp.arange(2 * max_new)
    ci = k_ids // 2
    k = k_ids % 2
    parent = cand[ci]
    child_needed = ok[ci] & (k < need[ci])
    dest = jnp.where(child_needed, free_idx[jnp.clip(slot0[ci] + k, 0, 2 * max_new - 1)], c)

    # child values: clones copy; splits resample xyz ~ N(mean, Sigma),
    # scale /= 0.8 * 2 (gaussian_model.py:373-396)
    eps = jax.random.normal(rng, (2 * max_new, 3))
    p_scale = jnp.exp(params.scaling[parent])
    rot = quat_to_rotmat(params.rotation[parent]
                         / jnp.maximum(jnp.linalg.norm(
                             params.rotation[parent], axis=-1, keepdims=True), 1e-12))
    sample = params.xyz[parent] + jnp.einsum(
        "nij,nj->ni", rot, eps * p_scale)
    is_split_row = cand_is_split[ci]
    new_xyz = jnp.where(is_split_row[:, None], sample, params.xyz[parent])
    new_scaling = jnp.where(is_split_row[:, None],
                            params.scaling[parent] - jnp.log(0.8 * 2),
                            params.scaling[parent])

    def scat(arr, vals):
        return arr.at[dest].set(vals, mode="drop")

    new_params = GaussianParams(
        xyz=scat(params.xyz, new_xyz),
        features_dc=scat(params.features_dc, params.features_dc[parent]),
        features_rest=scat(params.features_rest, params.features_rest[parent]),
        scaling=scat(params.scaling, new_scaling),
        rotation=scat(params.rotation, params.rotation[parent]),
        opacity=scat(params.opacity, params.opacity[parent]),
    )
    kill_parent = jnp.zeros(c, bool).at[cand].set(ok & cand_is_split, mode="drop")
    alive = (state.alive & ~kill_parent).at[dest].set(True, mode="drop")

    # prune: low opacity, oversized (screen/world) when enabled
    op = jax.nn.sigmoid(new_params.opacity[:, 0])
    prune = alive & (op < min_opacity)
    # size prune applies only when a positive threshold is given (the
    # jnp.where gates it; max_screen is a traced value)
    size_prune = (state.max_radii2d > max_screen) | (
        jnp.max(jnp.exp(new_params.scaling), axis=1) > 0.1 * extent)
    prune = jnp.where(max_screen > 0, prune | (alive & size_prune), prune)
    n_pruned = jnp.sum(prune)
    alive = alive & ~prune

    new_mu = jax.tree.map(lambda m_: m_.at[dest].set(0.0, mode="drop"), mu)
    new_nu = jax.tree.map(lambda m_: m_.at[dest].set(0.0, mode="drop"), nu)
    new_state = gs_empty_state(c).replace(alive=alive)
    return BgDensifyResult(params=new_params, mu=new_mu, nu=new_nu,
                           state=new_state, n_cloned=n_cloned,
                           n_split=n_split, n_pruned=n_pruned, dropped=dropped)


reset_opacity_bg = reset_opacity  # same law for both models


@functools.partial(jax.jit, static_argnames=())
def prune_near_mesh(alive: jax.Array, bg_xyz: jax.Array, mesh_xyz: jax.Array,
                    mesh_alive: jax.Array, min_dist_sq: float = 0.01):
    """Retire bg Gaussians whose nearest mesh Gaussian is closer than
    sqrt(min_dist_sq) (train_bg_gaussian.py:129-138, jt.misc.knn squared
    distances). Chunked MXU pairwise distances."""
    m_sq = jnp.sum(mesh_xyz * mesh_xyz, axis=1)
    m_sq = jnp.where(mesh_alive, m_sq, jnp.inf)

    def chunk(b):
        d2 = (jnp.sum(b * b, axis=1)[:, None] + m_sq[None, :]
              - 2.0 * b @ mesh_xyz.T)
        return jnp.min(d2, axis=1)

    n = bg_xyz.shape[0]
    pad = (-n) % 1024
    bp = jnp.pad(bg_xyz, ((0, pad), (0, 0)))
    dmin = jax.lax.map(chunk, bp.reshape(-1, 1024, 3)).reshape(-1)[:n]
    return alive & ~(dmin < min_dist_sq)
