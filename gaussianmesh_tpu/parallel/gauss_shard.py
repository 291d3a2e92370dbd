"""Gaussian-table sharding: pair all-to-all to tile-band owners.

The second scaling axis (SURVEY.md §5.8): beyond ~1M Gaussians the
replicated-parameter regime of `train_step` runs out of HBM — here every
device on the tile axis owns BOTH a shard of the Gaussian table (params,
optimizer state, preprocess work all scale down by D) and one horizontal
tile band of the image. Per step:

  1. local preprocess + offset-exact pair expansion over the FULL tile
     grid (each local Gaussian may touch any band);
  2. pairs are bucketed by owning band (one stable sort by destination,
     which preserves the local depth order within each bucket) and
     exchanged with ONE `lax.all_to_all`; the payload carries the pair's
     blend features, so no Gaussian table ever needs gathering across
     devices;
  3. the receiver re-establishes the reference's (tile, depth) order
     with a 3-key sort — (tile, depth, global id), the id breaking depth
     ties exactly like the single-chip stable argsort — then runs the
     ordinary tile-list build + blend on its band.

Differentiability: every data movement is a gather at stop-gradient
indices or the all_to_all itself, so autodiff routes pair-feature
cotangents backwards through the exchange (all_to_all transposes to the
reverse exchange) and the final gather-VJP scatter-add lands each
gradient on the device that OWNS the Gaussian — the per-shard equivalent
of the reference backward's atomicAdd reduction, with no psum over the
tile axis for parameter gradients at all.

Static shapes: per-destination send capacity (`send_capacity`) bounds
the exchange; overflow is counted and reported, never silent, matching
the conventions of ops/binning.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.models.render import GaussianArrays
from gaussianmesh_tpu.ops import binning, tile_blend
from gaussianmesh_tpu.ops import preprocess as prep_mod
from gaussianmesh_tpu.ops.preprocess import CameraArrays
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, _assemble


class GaussShardOut(NamedTuple):
    color: jax.Array          # (3, H_band, W)
    final_t: jax.Array        # (H_band, W)
    radii: jax.Array          # (N_local,) int32 — local shard visibility
    mean2d: jax.Array         # (N_local, 2) differentiable
    send_overflow: jax.Array  # () int32 pairs dropped by send_capacity
    rect_overflow: jax.Array  # () int32
    tile_overflow: jax.Array  # () int32
    pair_overflow: jax.Array  # () int32 aligned-layout capacity drops
    num_rendered: jax.Array   # () int32 pairs blended in this band


def rasterize_band_gauss_sharded(
        arrays: GaussianArrays, cam: CameraArrays, cfg: RasterizerConfig,
        gy_local: int, axis_name: str, send_capacity: int,
        bg: jax.Array,
        mean2d_offset: jax.Array | None = None,
        _emulate_d: int | None = None,
        _emulate_idx: jax.Array | int = 0) -> GaussShardOut:
    """Inside shard_map over `axis_name` (D devices): `arrays` is this
    device's Gaussian shard (N_local rows); the device also owns tile
    rows [idx*gy_local, (idx+1)*gy_local). cfg.height is the PADDED
    global height (grid_y == gy_local * D).

    `_emulate_d` (scaling harness only, tools/bench_scaling.py): run the
    per-device COMPUTE of a D-way sharded step on ONE chip outside any
    mesh — axis size/index become constants and the all_to_all an
    identity (this device's send buckets stand in for the received
    buckets; same row count as the real average, tile distribution
    approximated). Never set in production paths."""
    if _emulate_d is not None:
        d_ax = _emulate_d
        my = jnp.asarray(_emulate_idx, jnp.int32)

        def _exchange(x):
            return x
    else:
        d_ax = jax.lax.axis_size(axis_name)
        my = jax.lax.axis_index(axis_name)

        def _exchange(x):
            return jax.lax.all_to_all(x, axis_name, 0, 0, tiled=True)
    gx, gy = cfg.grid
    assert gy == gy_local * d_ax, (gy, gy_local, d_ax)
    nt_local = gx * gy_local
    n_local = arrays.xyz.shape[0]
    # global ids are transported through f32 for the depth tie-break; the
    # 2^24 integer-exactness bound mirrors binning.expand_pairs
    assert d_ax * n_local < (1 << 24), (d_ax, n_local)
    chunk = cfg.blend_chunk
    c_cap = send_capacity

    # 1. local preprocess over the full image
    prep = prep_mod.preprocess(arrays.xyz, arrays.cov6, cam, cfg.width,
                               cfg.height, opacity=arrays.opacity)
    prep = prep._replace(valid=prep.valid & arrays.active)
    mean2d = prep.mean2d
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset
    prep_sg = jax.tree.map(jax.lax.stop_gradient, prep)

    m_local = cfg.expand_capacity(n_local)
    exp = binning.expand_pairs(prep_sg, gx, gy, m_local,
                               opacity=arrays.opacity,
                               row_capacity=cfg.row_capacity(n_local))

    # differentiable blend-feature table + per-pair rows
    feat = tile_blend.pack_features(mean2d, prep.conic,
                                    arrays.opacity.reshape(-1), arrays.rgb,
                                    prep.valid)           # (N_local+1, 16)
    # counted reduction: expand_pairs knows the exact per-gaussian pair
    # multiset (sentinel-gid dummy pairs are interleaved, so the old
    # grouped-order shortcut no longer holds)
    from gaussianmesh_tpu.ops.segsum import gather_rows_counted
    rest = (m_local - jnp.sum(exp.gid_counts)).astype(jnp.int32)[None]
    pair_feat = gather_rows_counted(
        feat, exp.gid_slot,
        jnp.concatenate([exp.gid_counts, rest]))      # (m, 16)

    # 2. bucket by destination band; the stable sort keeps each bucket in
    # emission order (the receiver's 3-key sort establishes depth order)
    dest = jnp.minimum(exp.pair_tile // nt_local, d_ax)   # sentinel -> D
    m_idx = jnp.arange(m_local, dtype=jnp.int32)
    sdest, sidx = jax.lax.sort((dest, m_idx), num_keys=1, is_stable=True)
    dstarts = binning._tile_starts(sdest, d_ax)           # (D + 1,)

    kk = jnp.arange(d_ax, dtype=jnp.int32)[:, None]
    rr = jnp.arange(c_cap, dtype=jnp.int32)[None, :]
    slot_src = dstarts[kk] + rr                           # (D, C)
    slot_ok = slot_src < dstarts[kk + 1]
    send_overflow = jnp.sum(
        jnp.maximum(dstarts[1:] - dstarts[:-1] - c_cap, 0))
    src_pair = sidx[jnp.clip(slot_src, 0, m_local - 1)]   # (D, C)

    # metadata: band-local tile, depth, GLOBAL gaussian id (depth
    # tie-break identical to the single-chip stable depth argsort)
    gid_global = (my * n_local + exp.gid_slot).astype(jnp.float32)
    tile_local_all = (exp.pair_tile - dest * nt_local).astype(jnp.float32)
    meta = jnp.stack([tile_local_all, exp.pair_depth, gid_global], axis=-1)
    meta_send = jnp.where(slot_ok[..., None], meta[src_pair],
                          jnp.asarray([nt_local, jnp.inf,
                                       d_ax * n_local], jnp.float32))
    feat_send = jnp.where(slot_ok[..., None], pair_feat[src_pair], 0.0)
    # shift the mean's pixel y into the DESTINATION band's local frame
    # (slot row k goes to band k); a constant shift — exact, and the
    # y-gradient passes through unchanged
    yshift = (kk * (gy_local * prep_mod.TILE)).astype(jnp.float32)
    feat_send = feat_send.at[:, :, tile_blend.ROW_Y].add(
        jnp.where(slot_ok, -yshift, 0.0))

    # 3. ONE all-to-all each for metadata and features: recv[k] = what
    # device k sent to this band
    meta_recv = _exchange(meta_send)
    feat_recv = _exchange(feat_send)

    m_recv = d_ax * c_cap
    rm = jax.lax.stop_gradient(meta_recv.reshape(m_recv, 3))
    r_tile = rm[:, 0].astype(jnp.int32)
    r_gid = rm[:, 2].astype(jnp.int32)
    st, _, sg, perm = jax.lax.sort(
        (r_tile, rm[:, 1], r_gid, jnp.arange(m_recv, dtype=jnp.int32)),
        num_keys=3, is_stable=True)
    feat_sorted = feat_recv.reshape(m_recv, tile_blend.FEAT)[perm]

    num_valid = jnp.sum(r_tile < nt_local).astype(jnp.int32)
    p_cap = m_recv + cfg.aligned_pad(nt_local)
    p_cap = -(-p_cap // chunk) * chunk
    tiles = binning.finish_tile_lists(st, sg, num_valid, exp.rect_overflow,
                                      nt_local, cfg.max_per_tile, p_cap,
                                      chunk)

    if cfg.use_pallas:
        pad_len = 2 * chunk + (-m_recv) % chunk
        tile_pad = jnp.concatenate(
            [st, jnp.full((pad_len,), nt_local, jnp.int32)])
        live_pad = jnp.concatenate(
            [tiles.in_count, jnp.zeros((pad_len,), bool)])
        # Fused gather+blend: the received buffer IS the feature table
        # and `perm` the (bijective) gather — counts are all ones, so
        # blend_table_fused's counted reduction routes the kernel's
        # aligned-domain gradient rows straight back onto received rows
        # (sort + wide gather + degenerate tree) instead of the XLA
        # scatter-add the plain [perm] gather's VJP would emit
        # (~16 ns/row — the single-chip round-3 lesson, PERF.md). The
        # cotangents then route through the all_to_all transpose to the
        # owning shard exactly as before.
        feat_table = jnp.concatenate(
            [feat_recv.reshape(m_recv, tile_blend.FEAT),
             jnp.zeros((1, tile_blend.FEAT))])
        gid_pad = jnp.concatenate(
            [perm, jnp.full((pad_len,), m_recv, jnp.int32)])
        counts_full = jnp.concatenate(
            [jnp.ones((m_recv,), jnp.int32),
             jnp.asarray([pad_len], jnp.int32)])
        color_t, final_t_t, _ = tile_blend.blend_table_fused(
            feat_table, gid_pad, counts_full, tile_pad, live_pad,
            tiles.block_tile, tiles.aligned_starts, tiles.starts,
            tiles.counts, tiles.sorted_shift, gx, nt_local, p_cap, chunk)
    else:
        lists = binning.tile_id_lists(
            tiles._replace(sorted_gid=jnp.arange(m_recv, dtype=jnp.int32)),
            nt_local, cfg.max_per_tile, m_recv)
        feat_z = jnp.concatenate(
            [feat_sorted, jnp.zeros((1, tile_blend.FEAT))])
        tile_feats = jnp.swapaxes(feat_z[lists], 1, 2)
        color_t, final_t_t, _ = tile_blend.blend_tiles_jnp(tile_feats, gx)

    band_cfg = RasterizerConfig(width=cfg.width,
                                height=gy_local * prep_mod.TILE,
                                max_per_tile=cfg.max_per_tile)
    color = _assemble(color_t, band_cfg)
    final_t = _assemble(final_t_t[:, None], band_cfg)[0]
    color = color + final_t[None] * bg[:, None, None]

    return GaussShardOut(
        color=color, final_t=final_t,
        radii=jnp.where(prep_sg.valid, prep_sg.radius, 0),
        mean2d=prep.mean2d,
        send_overflow=send_overflow,
        rect_overflow=exp.rect_overflow,
        tile_overflow=tiles.tile_overflow,
        pair_overflow=tiles.pair_overflow,
        num_rendered=tiles.num_rendered)


def make_gauss_sharded_train_step(mesh, tx, cfg: RasterizerConfig,
                                  sh_degree: int, lambda_dssim: float,
                                  mr_weight: float, width: int,
                                  height_valid: int,
                                  send_capacity: int,
                                  axis_name: str = "shard"):
    """Training step with the Gaussian table, optimizer state and image
    bands all sharded over one mesh axis — the memory-scaling regime.

    Unlike train_step.make_sharded_train_step (replicated params, psum'd
    grads), the loss here is differentiated OUTSIDE the shard_map: a
    device's Gaussians contribute to OTHER devices' bands through the
    pair all_to_all, so only whole-program reverse-mode (whose transpose
    of all_to_all is the reverse exchange) yields the full gradient —
    an in-body value_and_grad of the local band loss would silently drop
    every cross-band term. Parameter gradients need NO collective: the
    exchange transpose already lands each cotangent on the owner.

    Densification: handled by train.densify.densify_and_split_gauss_sharded
    — per-shard masked compaction with O(D) cross-shard traffic and global
    vertex ids from an exclusive scan; MeshTrainer wires it up (and
    rebalances shards) when shard_gaussians > 1.
    """
    import optax
    from gaussianmesh_tpu.models import mesh_gaussians as mgs
    from gaussianmesh_tpu.models import render as render_mod
    from gaussianmesh_tpu.ops.preprocess import TILE
    from gaussianmesh_tpu.parallel.train_step import ssim_sum_band
    from gaussianmesh_tpu.train import densify as densify_mod
    from gaussianmesh_tpu.train import loss as loss_mod
    from jax.sharding import PartitionSpec as P

    d_ax = mesh.shape[axis_name]
    gx, gy = cfg.grid
    assert gy % d_ax == 0, (gy, d_ax)
    gy_local = gy // d_ax
    n_pix = 3 * height_valid * width

    def body(params_l, off_l, cam_t, gt_b, bg, binding_l):
        cam = CameraArrays(*cam_t)
        gt = gt_b  # (3, H_local, W)
        idx = jax.lax.axis_index(axis_name)
        row0 = idx * gy_local * TILE
        rows = row0 + jnp.arange(gy_local * TILE)
        row_ok = (rows < height_valid).astype(jnp.float32)[None, :, None]

        arrays = render_mod.mesh_model_arrays(params_l, binding_l, cam,
                                              sh_degree)
        out = rasterize_band_gauss_sharded(
            arrays, cam, cfg, gy_local, axis_name, send_capacity, bg,
            mean2d_offset=off_l)
        l1_sum = jnp.sum(jnp.abs(out.color - gt) * row_ok)
        ssim_sum = ssim_sum_band(out.color * row_ok, gt * row_ok,
                                 axis_name, row_mask=row_ok)
        mr = loss_mod.mesh_restrict_loss(
            mgs.get_scaling(params_l), binding_l.vertex1,
            binding_l.vertex2, binding_l.vertex3, binding_l.alive,
            mr_weight)
        local = ((1.0 - lambda_dssim) * l1_sum / n_pix
                 + lambda_dssim * (1.0 / d_ax - ssim_sum / n_pix) + mr)
        loss = jax.lax.psum(local, axis_name)
        overflow = jax.lax.psum(
            out.tile_overflow + out.send_overflow + out.rect_overflow
            + out.pair_overflow, axis_name)
        return loss, (out.radii, overflow)

    cam_spec = tuple(P() for _ in CameraArrays._fields)
    body_sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), cam_spec,
                  P(None, axis_name, None), P(), P(axis_name)),
        out_specs=(P(), (P(axis_name), P())),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, state, binding, cam_arrays, gt, bg):
        m2d_zero = jnp.zeros((binding.alive.shape[0], 2))

        def loss_fn(p, off):
            return body_sharded(p, off, tuple(cam_arrays), gt, bg, binding)

        (loss, (radii, overflow)), (g_params, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d_zero)
        updates, opt_state = tx.update(g_params, opt_state, params)
        params = optax.apply_updates(params, updates)
        visibility = radii > 0
        state = densify_mod.add_densification_stats(
            state, g_off, visibility, width, height_valid)
        state = state.replace(max_radii2d=jnp.where(
            visibility, jnp.maximum(state.max_radii2d,
                                    radii.astype(jnp.float32)),
            state.max_radii2d))
        metrics = {"loss": loss, "tile_overflow": overflow}
        return params, opt_state, state, metrics

    return step
