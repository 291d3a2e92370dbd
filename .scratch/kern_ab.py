"""A/B: fwd color-accumulate orientation + bwd moment-matmul restructure,
on the REAL tile lists from the bench scene."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from gaussianmesh_tpu.ops.tile_blend import (
    FEAT, PIX, TILE, T_EPS, ALPHA_MAX, ROW_X, ROW_Y, ROW_CA, ROW_CB, ROW_CC,
    ROW_OP, ROW_R, ROW_G, ROW_B, NCONTRIB_ROW,
    _pixel_coords, _alphas, _cumprod_lanes, _cumsum_lanes, _shift_one_lane,
    _sorted_window, _sorted_alpha_mask, _sorted_feat_specs,
    blend_sorted_pallas, _sorted_fwd_impl)
from scenes import look_at_camera, random_gaussians

W, H, N = 1920, 1080, 100_000
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3)
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = cfg.grid
chunk = cfg.blend_chunk
num_tiles = cfg.num_tiles
p_cap = cfg.pair_capacity(N)
pb = p_cap // chunk

prep = jax.jit(lambda m, c: prep_mod.preprocess(m, c, cam, W, H,
                                                opacity=sc["opacity"]))(
    sc["means3d"], sc["cov6"])
tiles = jax.jit(lambda p: binning.build_tile_lists(
    p, gx, gy, cfg.max_per_tile, expand_capacity=cfg.expand_capacity(N),
    pair_capacity=p_cap, chunk=chunk, opacity=sc["opacity"],
    row_capacity=cfg.row_capacity(N)))(prep)
feat = jax.jit(lambda p, o, r: tile_blend.pack_features(
    p.mean2d, p.conic, o.reshape(-1), r, p.valid))(
    prep, sc["opacity"], sc["rgb"])
m = tiles.sorted_gid.shape[0]
pad_len = chunk + (-m - chunk) % chunk
gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), N, jnp.int32)])
featT = jnp.asarray(feat[gid_pad].T)
btile = tiles.block_tile.astype(jnp.int32)
astarts = tiles.aligned_starts.astype(jnp.int32)
starts = tiles.starts.astype(jnp.int32)
counts = tiles.counts.astype(jnp.int32)
nb_feat = featT.shape[1] // chunk

STEPS = 10
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a); a2[0] = a2[0] + c * 1e-30
            r = fn(*a2)
            return sum(jnp.sum(l) for l in jax.tree.leaves(r)) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/STEPS*1e3
    print(f"{name:36s} {dt:8.2f} ms  ({dt/pb*1e3:5.2f} us/blk)", flush=True)

# ---------------- forward variants ----------------
def make_fwd(color_mode):
    def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, featA_ref,
               featB_ref, out_ref, ckpt_ref, carry):
        b = pl.program_id(0)
        t = btile_ref[b]
        prev_t = jnp.where(b > 0, btile_ref[jnp.maximum(b - 1, 0)], -1)
        next_t = btile_ref[b + 1]

        @pl.when(t < num_tiles)
        def _valid():
            @pl.when(t != prev_t)
            def _first():
                carry[...] = jnp.ones_like(carry)
                carry[2, :] = jnp.zeros_like(carry[2, :])
                out_ref[...] = jnp.zeros_like(out_ref)
            s_in = carry[0, :]
            ckpt_ref[0, 0, :] = s_in

            def _work():
                tile_x = t % gx
                tile_y = t // gx
                feat = _sorted_window(featA_ref, featB_ref, b, chunk,
                                      astarts_ref, starts_ref, t)
                px, py = _pixel_coords(tile_x, tile_y)
                alpha, _, _, _, _, _ = _alphas(feat, px, py)
                live_lane = _sorted_alpha_mask(b, chunk, astarts_ref,
                                               counts_ref, t)
                alpha = jnp.where(live_lane, alpha, 0.0)
                om = 1.0 - alpha
                local_cum = _cumprod_lanes(om)
                s = s_in[:, None] * local_cum
                include = s >= T_EPS
                s_excl = s_in[:, None] * _shift_one_lane(local_cum, 1.0)
                w = alpha * s_excl * include
                rgb3 = feat[ROW_R:ROW_B + 1]
                if color_mode == "pix3":
                    colors = jax.lax.dot_general(
                        w, rgb3, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[0, 0, :] += colors[:, 0]
                    out_ref[0, 1, :] += colors[:, 1]
                    out_ref[0, 2, :] += colors[:, 2]
                else:  # "3pix"
                    colors3 = jax.lax.dot_general(
                        rgb3, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (3, PIX)
                    out_ref[0, 0:3, :] += colors3
                carry[0, :] = s[:, s.shape[1] - 1]
                s_last_inc = jnp.min(jnp.where(include, local_cum, 1.0), axis=1)
                carry[1, :] *= s_last_inc
            pl.when(jnp.max(s_in) >= T_EPS)(_work)

            @pl.when(t != next_t)
            def _last():
                out_ref[0, 3, :] = carry[1, :]
                out_ref[0, NCONTRIB_ROW, :] = carry[2, :]
    return kernel

def run_fwd(mode):
    kernel = make_fwd(mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(pb,),
        in_specs=_sorted_feat_specs(chunk, nb_feat, reverse=False),
        out_specs=(
            pl.BlockSpec((1, 8, PIX),
                         lambda b, bt, *s: (jnp.minimum(bt[b], num_tiles - 1), 0, 0)),
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32)])
    def f(featT):
        return pl.pallas_call(kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
                       jax.ShapeDtypeStruct((pb, 1, PIX), jnp.float32)),
        )(btile, astarts, counts, starts, featT, featT)
    return f

o1 = run_fwd("pix3")(featT)
o2 = run_fwd("3pix")(featT)
print("fwd 3pix max color diff:",
      float(jnp.abs(o1[0][:, :3] - o2[0][:, :3]).max()), flush=True)
timeit("fwd pix3 (current)", run_fwd("pix3"), featT)
timeit("fwd 3pix (one accum)", run_fwd("3pix"), featT)

# ---------------- backward variants ----------------
(out_cur, ckpt) = _sorted_fwd_impl(featT, btile, astarts, starts, counts,
                                   gx, num_tiles, p_cap, chunk)
color, final_t, ncon = out_cur
g8 = jnp.stack([jnp.ones_like(final_t) * 0.3, jnp.ones_like(final_t) * 0.4,
                jnp.ones_like(final_t) * 0.3, jnp.ones_like(final_t) * 0.1,
                final_t, jnp.zeros_like(final_t), jnp.zeros_like(final_t),
                jnp.zeros_like(final_t)], axis=1)

def make_bwd(mode):
    def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, featA_ref,
               featB_ref, ckpt_ref, g_ref, dpart_ref, qcarry):
        pb_ = pl.num_programs(0)
        b = pb_ - 1 - pl.program_id(0)
        t = btile_ref[b]
        later_t = btile_ref[b + 1]
        @pl.when((t < num_tiles) & (t != later_t))
        def _init_tile():
            qcarry[0, :] = g_ref[0, 3, :] * g_ref[0, NCONTRIB_ROW, :]
        s_start_pre = ckpt_ref[0, 0, :]
        live_blk = (t < num_tiles) & (jnp.max(s_start_pre) >= T_EPS)

        @pl.when(live_blk)
        def _valid():
            tile_x = t % gx
            tile_y = t // gx
            feat = _sorted_window(featA_ref, featB_ref, b, chunk,
                                  astarts_ref, starts_ref, t)
            px, py = _pixel_coords(tile_x, tile_y)
            alpha, gate, e_pow, raw, dx, dy = _alphas(feat, px, py)
            live_lane = _sorted_alpha_mask(b, chunk, astarts_ref,
                                           counts_ref, t)
            alpha = jnp.where(live_lane, alpha, 0.0)
            g_r = g_ref[0, 0, :][:, None]
            g_g = g_ref[0, 1, :][:, None]
            g_b = g_ref[0, 2, :][:, None]
            s_start = s_start_pre
            om = 1.0 - alpha
            local_cum = _cumprod_lanes(om)
            s = s_start[:, None] * local_cum
            include = s >= T_EPS
            s_excl = s_start[:, None] * _shift_one_lane(local_cum, 1.0)
            w = alpha * s_excl * include
            dldw = (g_r * feat[ROW_R][None, :] + g_g * feat[ROW_G][None, :]
                    + g_b * feat[ROW_B][None, :])
            a_mat = dldw * w
            chunk_sum = jnp.sum(a_mat, axis=1)
            suffix = chunk_sum[:, None] - _cumsum_lanes(a_mat)
            q = qcarry[0, :][:, None] + suffix
            dalpha = (dldw * s_excl - q / om) * include
            capped = raw > ALPHA_MAX
            live = gate & (~capped) & live_lane
            dalpha = jnp.where(live, dalpha, 0.0)
            dpower = dalpha * alpha
            if mode == "current":
                dop_elem = dalpha * e_pow
                zero = jnp.zeros((chunk,), jnp.float32)
                dpart_ref[...] = jnp.stack([
                    jnp.sum(dpower * (-(feat[ROW_CA][None, :] * dx
                                        + feat[ROW_CB][None, :] * dy)), axis=0),
                    jnp.sum(dpower * (-(feat[ROW_CC][None, :] * dy
                                        + feat[ROW_CB][None, :] * dx)), axis=0),
                    jnp.sum(dpower * (-0.5 * dx * dx), axis=0),
                    jnp.sum(dpower * (-dx * dy), axis=0),
                    jnp.sum(dpower * (-0.5 * dy * dy), axis=0),
                    jnp.sum(dop_elem, axis=0),
                    jnp.sum(jnp.where(live_lane, g_r * w, 0.0), axis=0),
                    jnp.sum(jnp.where(live_lane, g_g * w, 0.0), axis=0),
                    jnp.sum(jnp.where(live_lane, g_b * w, 0.0), axis=0),
                    zero, zero, zero, zero, zero, zero, zero,
                ])
            else:  # "moments"
                # P6 = [1, px, py, px^2, px*py, py^2]  (PIX, 6 -> 8 padded)
                p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
                pxc = (tile_x * TILE + p % TILE).astype(jnp.float32)
                pyc = (tile_y * TILE + p // TILE).astype(jnp.float32)
                one = jnp.ones_like(pxc)
                P6 = jnp.concatenate(
                    [one, pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc,
                     jnp.where(live_lane[0:1, 0:1] | True, g_r, g_r),
                     g_g], axis=1)  # (PIX, 8): moments + 2 color-grad rows
                mom = jax.lax.dot_general(
                    P6, dpower, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (8, chunk)
                wm = jnp.where(live_lane, w, 0.0)
                cg = jax.lax.dot_general(
                    jnp.concatenate([g_r, g_g, g_b, g_b,
                                     one, one, one, one], axis=1),
                    wm, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (8, chunk)
                S0, S1x, S1y = mom[0], mom[1], mom[2]
                S2xx, S2xy, S2yy = mom[3], mom[4], mom[5]
                x = feat[ROW_X]; y = feat[ROW_Y]
                ca = feat[ROW_CA]; cb = feat[ROW_CB]; cc = feat[ROW_CC]
                op = feat[ROW_OP]
                mx0 = x * S0 - S1x
                my0 = y * S0 - S1y
                d_x = -(ca * mx0 + cb * my0)
                d_y = -(cc * my0 + cb * mx0)
                d_ca = -0.5 * (x * mx0 - (x * S1x - S2xx))
                d_cb = -(x * my0 - (y * S1x - S2xy))
                d_cc = -0.5 * (y * my0 - (y * S1y - S2yy))
                d_op = jnp.where(op > 0, S0 / jnp.maximum(op, 1e-12), 0.0)
                zero = jnp.zeros((chunk,), jnp.float32)
                dpart_ref[...] = jnp.stack([
                    d_x, d_y, d_ca, d_cb, d_cc, d_op,
                    cg[0], cg[1], cg[2],
                    zero, zero, zero, zero, zero, zero, zero,
                ])
            qcarry[0, :] += chunk_sum
        @pl.when(~live_blk)
        def _pad_block():
            dpart_ref[...] = jnp.zeros_like(dpart_ref)
    return kernel

def run_bwd(mode):
    kernel = make_bwd(mode)
    def rev(b, *s):
        return (0, pl.num_programs(0) - 1 - b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(pb,),
        in_specs=_sorted_feat_specs(chunk, nb_feat, reverse=True) + [
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (pl.num_programs(0) - 1 - b, 0, 0)),
            pl.BlockSpec((1, 8, PIX),
                         lambda b, bt, *s: (
                             jnp.minimum(bt[pl.num_programs(0) - 1 - b],
                                         num_tiles - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((FEAT, chunk), rev),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32)])
    def f(featT):
        return pl.pallas_call(kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((FEAT, p_cap), jnp.float32),
        )(btile, astarts, counts, starts, featT, featT, ckpt, g8)
    return f

d1 = run_bwd("current")(featT)
d2 = run_bwd("moments")(featT)
scale = float(jnp.abs(d1).max())
print("bwd moments max scaled diff:",
      float(jnp.abs(d1 - d2).max()) / scale, flush=True)
timeit("bwd current", run_bwd("current"), featT)
timeit("bwd moments", run_bwd("moments"), featT)
