"""Isolated fwd/bwd variants: column carries, g8 column blocks."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from gaussianmesh_tpu.ops.tile_blend import (
    FEAT, PIX, TILE, T_EPS, ALPHA_MAX, ROW_CA, ROW_CB, ROW_CC,
    ROW_R, ROW_G, ROW_B, NCONTRIB_ROW,
    _pixel_coords, _alphas, _cumprod_lanes, _cumsum_lanes, _shift_one_lane,
    _sorted_window, _sorted_alpha_mask, _sorted_feat_specs, _sorted_fwd_impl)
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

# ---------- fwd col-carry (ckpt row) ----------
def make_fwd_col():
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
                out_ref[...] = jnp.zeros_like(out_ref)
            s_in = carry[:, 0:1]
            ckpt_ref[0, 0, :] = s_in[:, 0]
            def _work():
                tile_x = t % gx; tile_y = t // gx
                featv = _sorted_window(featA_ref, featB_ref, b, chunk,
                                       astarts_ref, starts_ref, t)
                px, py = _pixel_coords(tile_x, tile_y)
                alpha, _, _, _, _, _ = _alphas(featv, px, py)
                live_lane = _sorted_alpha_mask(b, chunk, astarts_ref,
                                               counts_ref, t)
                alpha = jnp.where(live_lane, alpha, 0.0)
                om = 1.0 - alpha
                local_cum = _cumprod_lanes(om)
                s = s_in * local_cum
                include = s >= T_EPS
                s_excl = s_in * _shift_one_lane(local_cum, 1.0)
                w = alpha * s_excl * include
                rgb3 = featv[ROW_R:ROW_B + 1]
                colors3 = jax.lax.dot_general(
                    rgb3, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, 0:3, :] += colors3
                carry[:, 0:1] = s[:, chunk - 1:chunk]
                s_last_inc = jnp.min(jnp.where(include, local_cum, 1.0),
                                     axis=1, keepdims=True)
                carry[:, 1:2] *= s_last_inc
            pl.when(jnp.max(s_in) >= T_EPS)(_work)
            @pl.when(t != next_t)
            def _last():
                out_ref[0, 3, :] = carry[:, 1]
                out_ref[0, NCONTRIB_ROW, :] = jnp.zeros((PIX,), jnp.float32)
    return kernel

def run_fwd_col():
    kernel = make_fwd_col()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(pb,),
        in_specs=_sorted_feat_specs(chunk, nb_feat, reverse=False),
        out_specs=(
            pl.BlockSpec((1, 8, PIX),
                         lambda b, bt, *s: (jnp.minimum(bt[b], num_tiles - 1), 0, 0)),
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((PIX, 8), jnp.float32)])
    def f(featT):
        return pl.pallas_call(kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
                       jax.ShapeDtypeStruct((pb, 1, PIX), jnp.float32)),
        )(btile, astarts, counts, starts, featT, featT)
    return f

def run_fwd_cur():
    def f(featT):
        return _sorted_fwd_impl(featT, btile, astarts, starts, counts,
                                gx, num_tiles, p_cap, chunk)
    return f

timeit("fwd current (row carry)", run_fwd_cur(), featT)
timeit("fwd col carry", run_fwd_col(), featT)

# ---------- bwd variants ----------
(out_cur, ckpt) = _sorted_fwd_impl(featT, btile, astarts, starts, counts,
                                   gx, num_tiles, p_cap, chunk)
color, final_t, ncon = out_cur
g8_row = jnp.stack([jnp.ones_like(final_t) * 0.3, jnp.ones_like(final_t) * 0.4,
                    jnp.ones_like(final_t) * 0.3, jnp.ones_like(final_t) * 0.1,
                    final_t, jnp.zeros_like(final_t), jnp.zeros_like(final_t),
                    jnp.zeros_like(final_t)], axis=1)     # (T, 8, PIX)
g8_col = jnp.transpose(g8_row, (0, 2, 1))                 # (T, PIX, 8)

def make_bwd(gcol, qcol):
    def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, featA_ref,
               featB_ref, ckpt_ref, g_ref, dpart_ref, qcarry):
        pb_ = pl.num_programs(0)
        b = pb_ - 1 - pl.program_id(0)
        t = btile_ref[b]
        later_t = btile_ref[b + 1]
        @pl.when((t < num_tiles) & (t != later_t))
        def _init_tile():
            if gcol and qcol:
                qcarry[...] = g_ref[0, :, 3:4] * g_ref[0, :, 4:5]
            elif gcol:
                qcarry[0, :] = (g_ref[0, :, 3:4] * g_ref[0, :, 4:5])[:, 0]
            else:
                qcarry[0, :] = g_ref[0, 3, :] * g_ref[0, NCONTRIB_ROW, :]
        s_start_pre = ckpt_ref[0, 0, :]
        live_blk = (t < num_tiles) & (jnp.max(s_start_pre) >= T_EPS)
        @pl.when(live_blk)
        def _valid():
            tile_x = t % gx; tile_y = t // gx
            featv = _sorted_window(featA_ref, featB_ref, b, chunk,
                                   astarts_ref, starts_ref, t)
            px, py = _pixel_coords(tile_x, tile_y)
            alpha, gate, e_pow, raw, dx, dy = _alphas(featv, px, py)
            live_lane = _sorted_alpha_mask(b, chunk, astarts_ref,
                                           counts_ref, t)
            alpha = jnp.where(live_lane, alpha, 0.0)
            if gcol:
                g_r = g_ref[0, :, 0:1]; g_g = g_ref[0, :, 1:2]; g_b = g_ref[0, :, 2:3]
            else:
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
            dldw = (g_r * featv[ROW_R][None, :] + g_g * featv[ROW_G][None, :]
                    + g_b * featv[ROW_B][None, :])
            a_mat = dldw * w
            if qcol:
                chunk_sum = jnp.sum(a_mat, axis=1, keepdims=True)
                suffix = chunk_sum - _cumsum_lanes(a_mat)
                q = qcarry[...] + suffix
            else:
                chunk_sum = jnp.sum(a_mat, axis=1)
                suffix = chunk_sum[:, None] - _cumsum_lanes(a_mat)
                q = qcarry[0, :][:, None] + suffix
            dalpha = (dldw * s_excl - q / om) * include
            capped = raw > ALPHA_MAX
            live = gate & (~capped) & live_lane
            dalpha = jnp.where(live, dalpha, 0.0)
            dop_elem = dalpha * e_pow
            dpower = dalpha * alpha
            zero = jnp.zeros((chunk,), jnp.float32)
            dpart_ref[...] = jnp.stack([
                jnp.sum(dpower * (-(featv[ROW_CA][None, :] * dx
                                    + featv[ROW_CB][None, :] * dy)), axis=0),
                jnp.sum(dpower * (-(featv[ROW_CC][None, :] * dy
                                    + featv[ROW_CB][None, :] * dx)), axis=0),
                jnp.sum(dpower * (-0.5 * dx * dx), axis=0),
                jnp.sum(dpower * (-dx * dy), axis=0),
                jnp.sum(dpower * (-0.5 * dy * dy), axis=0),
                jnp.sum(dop_elem, axis=0),
                jnp.sum(jnp.where(live_lane, g_r * w, 0.0), axis=0),
                jnp.sum(jnp.where(live_lane, g_g * w, 0.0), axis=0),
                jnp.sum(jnp.where(live_lane, g_b * w, 0.0), axis=0),
                zero, zero, zero, zero, zero, zero, zero,
            ])
            if qcol:
                qcarry[...] += chunk_sum
            else:
                qcarry[0, :] += chunk_sum
        @pl.when(~live_blk)
        def _pad_block():
            dpart_ref[...] = jnp.zeros_like(dpart_ref)
    return kernel

def run_bwd(gcol, qcol):
    kernel = make_bwd(gcol, qcol)
    def rev(b, *s):
        return (0, pl.num_programs(0) - 1 - b)
    gspec = (pl.BlockSpec((1, PIX, 8),
                          lambda b, bt, *s: (jnp.minimum(bt[pl.num_programs(0) - 1 - b],
                                                         num_tiles - 1), 0, 0))
             if gcol else
             pl.BlockSpec((1, 8, PIX),
                          lambda b, bt, *s: (jnp.minimum(bt[pl.num_programs(0) - 1 - b],
                                                         num_tiles - 1), 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(pb,),
        in_specs=_sorted_feat_specs(chunk, nb_feat, reverse=True) + [
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (pl.num_programs(0) - 1 - b, 0, 0)),
            gspec,
        ],
        out_specs=pl.BlockSpec((FEAT, chunk), rev),
        scratch_shapes=[pltpu.VMEM((PIX, 1) if qcol else (8, PIX), jnp.float32)])
    g8 = g8_col if gcol else g8_row
    def f(featT):
        return pl.pallas_call(kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((FEAT, p_cap), jnp.float32),
        )(btile, astarts, counts, starts, featT, featT, ckpt, g8)
    return f

d0 = run_bwd(False, False)(featT)
d1 = run_bwd(True, False)(featT)
d2 = run_bwd(True, True)(featT)
sc_ = float(jnp.abs(d0).max())
print("b1 diff:", float(jnp.abs(d0-d1).max())/sc_,
      "b2 diff:", float(jnp.abs(d0-d2).max())/sc_, flush=True)
timeit("bwd current (rows)", run_bwd(False, False), featT)
timeit("bwd g8 col blocks", run_bwd(True, False), featT)
timeit("bwd g8 col + q col", run_bwd(True, True), featT)
