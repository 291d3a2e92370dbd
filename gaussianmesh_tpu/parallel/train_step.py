"""Sharded training step: shard_map over a ("data", "tile") device mesh.

Per step, each data-group takes one camera; within a data-group each
device owns a contiguous horizontal band of image tiles:

  1. preprocess all Gaussians (replicated — vectorized and cheap relative
     to blending, which is pixel-proportional);
  2. clip tile rects to the local band, bin + sort + gather + blend ONLY
     the band (this is where the work scales down with devices);
  3. photometric loss on the band — L1 locally, SSIM with a 5-row halo
     exchange so band boundaries match the single-chip conv exactly;
  4. one psum over (data, tile) yields the exact global gradient; the
     optimizer then applies identical updates on every device.

This gives pixel/camera parallelism with replicated parameters — the
right regime for <=1M Gaussians. Sharding the Gaussian table itself
(all-to-all of (tile, id) pairs to band owners) is the next axis and
slots into step 2 without changing the loss structure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.models import render as render_mod
from gaussianmesh_tpu.ops import binning, tile_blend
from gaussianmesh_tpu.ops import preprocess as prep_mod
from gaussianmesh_tpu.ops.preprocess import TILE, CameraArrays
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, _assemble
from gaussianmesh_tpu.parallel.sharding import (DATA_AXIS, TILE_AXIS,
                                                halo_exchange_rows)
from gaussianmesh_tpu.train import densify as densify_mod
from gaussianmesh_tpu.train import loss as loss_mod


def clip_to_band(prep, y0_tiles, gy_local: int):
    """Restrict tile rects to [y0, y0 + gy_local) tile rows (local coords)."""
    rmin_y = jnp.clip(prep.rect_min[:, 1] - y0_tiles, 0, gy_local)
    rmax_y = jnp.clip(prep.rect_max[:, 1] - y0_tiles, 0, gy_local)
    touched = (prep.rect_max[:, 0] - prep.rect_min[:, 0]) * (rmax_y - rmin_y)
    return prep._replace(
        rect_min=prep.rect_min.at[:, 1].set(rmin_y),
        rect_max=prep.rect_max.at[:, 1].set(rmax_y),
        tiles_touched=touched.astype(jnp.int32),
        valid=prep.valid & (touched > 0),
    )


class BandOut(NamedTuple):
    color: jax.Array       # (3, H_local, W_pad)
    final_t: jax.Array     # (H_local, W_pad)
    radii: jax.Array       # (N,) — full-image visibility (replicated)
    tile_overflow: jax.Array
    rect_overflow: jax.Array
    pair_overflow: jax.Array
    num_rendered: jax.Array


def rasterize_band(arrays: render_mod.GaussianArrays, cam: CameraArrays,
                   cfg: RasterizerConfig, gy_local: int, y0_tiles,
                   bg: jax.Array,
                   mean2d_offset: jax.Array | None = None) -> BandOut:
    """Band-local rasterization. cfg.height is the PADDED global height
    (grid_y = gy_local * n_tile_devices)."""
    gx, _ = cfg.grid
    prep = prep_mod.preprocess(arrays.xyz, arrays.cov6, cam, cfg.width,
                               cfg.height, opacity=arrays.opacity)
    prep = prep._replace(valid=prep.valid & arrays.active)
    full_radii = jnp.where(prep.valid, prep.radius, 0)

    band = clip_to_band(prep, y0_tiles, gy_local)
    # shift y into band-local pixel coords BEFORE binning: the blend kernel
    # and the binning-time ellipse cull both derive pixel positions from
    # local tile ids; the Gaussian footprint is translation invariant so
    # shifting the mean is exact (constant shift — gradient unchanged).
    band = band._replace(mean2d=band.mean2d - jnp.stack(
        [jnp.zeros_like(y0_tiles, jnp.float32),
         (y0_tiles * TILE).astype(jnp.float32)])[None, :])
    band_static = jax.tree.map(jax.lax.stop_gradient, band)
    n = arrays.xyz.shape[0]
    p_cap = cfg.pair_capacity(n, num_tiles=gx * gy_local)
    tiles = binning.build_tile_lists(band_static, gx, gy_local,
                                     cfg.max_per_tile,
                                     expand_capacity=cfg.expand_capacity(n),
                                     pair_capacity=p_cap,
                                     chunk=cfg.blend_chunk,
                                     opacity=arrays.opacity,
                                     row_capacity=cfg.row_capacity(n))

    mean2d = band.mean2d
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    feat = tile_blend.pack_features(mean2d, band.conic, arrays.opacity,
                                    arrays.rgb, band.valid)
    if cfg.use_pallas:
        color_t, final_t_t, _ = tile_blend.blend_sorted_table(
            feat, tiles, gx, gx * gy_local, p_cap, cfg.blend_chunk, n)
    else:
        lists = binning.tile_id_lists(tiles, gx * gy_local, cfg.max_per_tile, n)
        tile_feats = jnp.swapaxes(feat[lists], 1, 2)
        color_t, final_t_t, _ = tile_blend.blend_tiles_jnp(tile_feats, gx)

    band_cfg = RasterizerConfig(width=cfg.width, height=gy_local * TILE,
                                max_per_tile=cfg.max_per_tile)
    color = _assemble(color_t, band_cfg)
    final_t = _assemble(final_t_t[:, None], band_cfg)[0]
    color = color + final_t[None] * bg[:, None, None]
    return BandOut(color=color, final_t=final_t, radii=full_radii,
                   tile_overflow=tiles.tile_overflow,
                   rect_overflow=tiles.rect_overflow,
                   pair_overflow=tiles.pair_overflow,
                   num_rendered=tiles.num_rendered)


def ssim_sum_band(img: jax.Array, gt: jax.Array, axis_name: str,
                  row_mask: jax.Array | None = None,
                  window_size: int = 11) -> jax.Array:
    """Sum of the SSIM map over this band, halo-exchanged so the result
    psums to exactly the single-chip ssim_map total. `row_mask`
    (1, H_local, 1) drops map rows in the padded region (the inputs must
    already be zeroed there, mirroring the single-chip zero padding)."""
    halo = window_size // 2
    img_h = halo_exchange_rows(img, halo, axis_name)
    gt_h = halo_exchange_rows(gt, halo, axis_name)

    # valid conv (no padding) over the halo'd band == same-padded global
    # conv restricted to this band's rows; W edges use explicit zero pad.
    pad_w = [(0, 0)] * (img_h.ndim - 1) + [(halo, halo)]
    img_h = jnp.pad(img_h, pad_w)
    gt_h = jnp.pad(gt_h, pad_w)

    c = img_h.shape[0]
    w1d = jnp.asarray(loss_mod._gaussian_window(window_size, 1.5), img.dtype)
    kx = jnp.tile(w1d[None, None, None, :], (c, 1, 1, 1))
    ky = jnp.tile(w1d[None, None, :, None], (c, 1, 1, 1))

    def blur(x):
        x = jax.lax.conv_general_dilated(
            x[None], kx, (1, 1), [(0, 0), (0, 0)], feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jax.lax.conv_general_dilated(
            x, ky, (1, 1), [(0, 0), (0, 0)], feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]

    mu1, mu2 = blur(img_h), blur(gt_h)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img_h * img_h) - mu1_sq
    s2 = blur(gt_h * gt_h) - mu2_sq
    s12 = blur(img_h * gt_h) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    if row_mask is not None:
        ssim_map = ssim_map * row_mask
    return jnp.sum(ssim_map)


def make_sharded_train_step(mesh: Mesh, tx, cfg: RasterizerConfig,
                            sh_degree: int, lambda_dssim: float,
                            mr_weight: float, width: int, height_valid: int):
    """Returns step(params, opt_state, state, binding, cam_batch, gt_batch,
    bg) — fully jitted; cam_batch leaves lead with the data axis."""
    n_data = mesh.shape[DATA_AXIS]
    n_tile = mesh.shape[TILE_AXIS]
    gx, gy = cfg.grid
    assert gy % n_tile == 0, (gy, n_tile)
    gy_local = gy // n_tile
    n_pix = 3 * height_valid * width  # per camera, valid region

    def body(params, m2d_zero, cam_batch, gt_band, bg, binding):
        cam = CameraArrays(*(leaf[0] for leaf in cam_batch))
        gt = gt_band[0]  # (3, H_local, W)
        y0 = jax.lax.axis_index(TILE_AXIS) * gy_local

        # rows of this band that are inside the valid (uncropped) image
        row0 = y0 * TILE
        rows = row0 + jnp.arange(gy_local * TILE)
        row_ok = (rows < height_valid).astype(jnp.float32)[None, :, None]

        def loss_fn(p, off):
            arrays = render_mod.mesh_model_arrays(p, binding, cam, sh_degree)
            out = rasterize_band(arrays, cam, cfg, gy_local, y0, bg, off)
            l1_sum = jnp.sum(jnp.abs(out.color - gt) * row_ok)
            ssim_sum = ssim_sum_band(out.color * row_ok, gt * row_ok,
                                     TILE_AXIS, row_mask=row_ok)
            mr = loss_mod.mesh_restrict_loss(
                mgs.get_scaling(p), binding.vertex1, binding.vertex2,
                binding.vertex3, binding.alive, mr_weight)
            local = ((1.0 - lambda_dssim) * l1_sum / n_pix
                     + lambda_dssim * (1.0 / n_tile - ssim_sum / n_pix)
                     ) / n_data + mr / (n_data * n_tile)
            return local, out

        (local_loss, out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d_zero)
        loss = jax.lax.psum(local_loss, (DATA_AXIS, TILE_AXIS))
        g_params = jax.lax.psum(grads[0], (DATA_AXIS, TILE_AXIS))
        # densification stats accumulate PER VIEW (the reference adds one
        # ||dL_v/d mean2d|| and one visibility count per iteration,
        # train_mesh_gaussian.py:123-124): psum the pixel grads over the
        # TILE axis only (bands partition one camera's pixels — exact),
        # norm per view, undo the 1/n_data loss normalization, THEN
        # reduce across cameras. A norm of the cross-camera SUM would let
        # opposing views cancel and starve densification.
        g_off_view = jax.lax.psum(grads[1], TILE_AXIS) * n_data
        scaled = g_off_view * jnp.asarray([0.5 * width, 0.5 * height_valid])
        vis_v = out.radii > 0
        norm_v = jnp.where(vis_v, jnp.linalg.norm(scaled, axis=-1), 0.0)
        gnorm_sum = jax.lax.psum(norm_v, DATA_AXIS)
        vis_count = jax.lax.psum(vis_v.astype(jnp.float32), DATA_AXIS)
        radii = jax.lax.pmax(out.radii, (DATA_AXIS, TILE_AXIS))
        overflow = jax.lax.psum(
            out.tile_overflow + out.rect_overflow + out.pair_overflow,
            (DATA_AXIS, TILE_AXIS))
        return loss, g_params, gnorm_sum, vis_count, radii, overflow

    cam_spec = tuple(P(DATA_AXIS) for _ in CameraArrays._fields)
    body_sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), cam_spec, P(DATA_AXIS, None, TILE_AXIS, None),
                  P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, state, binding, cam_batch, gt_batch, bg):
        m2d_zero = jnp.zeros((binding.alive.shape[0], 2))
        loss, g_params, gnorm_sum, vis_count, radii, overflow = body_sharded(
            params, m2d_zero, tuple(cam_batch), gt_batch, bg, binding)
        updates, opt_state = tx.update(g_params, opt_state, params)
        params = optax.apply_updates(params, updates)
        visibility = radii > 0
        state = state.replace(
            grad_accum=state.grad_accum + gnorm_sum,
            denom=state.denom + vis_count)
        state = state.replace(max_radii2d=jnp.where(
            visibility, jnp.maximum(state.max_radii2d,
                                    radii.astype(jnp.float32)),
            state.max_radii2d))
        metrics = {"loss": loss, "tile_overflow": overflow}
        return params, opt_state, state, metrics

    return step
