"""Optimization experiments for the sorted-blend FWD kernel."""
import sys, time, functools
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from gaussianmesh_tpu.ops.tile_blend import (
    FEAT, PIX, T_EPS, ROW_R, ROW_B, _pixel_coords, _alphas,
    _shift_one_lane, _sorted_window, _sorted_alpha_mask)
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
            a2 = list(a); a2[0] = a2[0] + (c * 1e-30)
            r = fn(*a2)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(r))
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:40s} {dt:8.2f} ms  ({dt/pb*1e3:6.2f} us/blk)", flush=True)
    return dt


def _cumprod_roll(x):
    """Inclusive lane cumprod via pltpu.roll + iota mask (no concat copies)."""
    k = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < k:
        shifted = pltpu.roll(x, d, axis=1)
        x = x * jnp.where(lane >= d, shifted, 1.0)
        d *= 2
    return x


def make_kernel(variant):
    scan = _cumprod_roll if "rollscan" in variant else tile_blend._cumprod_lanes
    scratch_color = "scratchcol" in variant

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
                if scratch_color:
                    carry[2, :] = jnp.zeros_like(carry[2, :])
                    carry[3, :] = jnp.zeros_like(carry[3, :])
                    carry[4, :] = jnp.zeros_like(carry[4, :])
                else:
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
                local_cum = scan(om)
                s = s_in[:, None] * local_cum
                include = s >= T_EPS
                s_excl = s_in[:, None] * _shift_one_lane(local_cum, 1.0)
                w = alpha * s_excl * include

                rgb3 = feat[ROW_R:ROW_B + 1]
                colors = jax.lax.dot_general(
                    w, rgb3, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if scratch_color:
                    carry[2, :] += colors[:, 0]
                    carry[3, :] += colors[:, 1]
                    carry[4, :] += colors[:, 2]
                else:
                    out_ref[0, 0, :] += colors[:, 0]
                    out_ref[0, 1, :] += colors[:, 1]
                    out_ref[0, 2, :] += colors[:, 2]

                carry[0, :] = s[:, s.shape[1] - 1]
                s_last_inc = jnp.min(jnp.where(include, local_cum, 1.0), axis=1)
                carry[1, :] *= s_last_inc

            pl.when(jnp.max(s_in) >= T_EPS)(_work)

            @pl.when(t != next_t)
            def _last():
                if scratch_color:
                    out_ref[0, 0, :] = carry[2, :]
                    out_ref[0, 1, :] = carry[3, :]
                    out_ref[0, 2, :] = carry[4, :]
                out_ref[0, 3, :] = carry[1, :]

    return kernel


def run(variant):
    kernel = make_kernel(variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[
            pl.BlockSpec((FEAT, chunk),
                         lambda b, bt, a, c, s: (0, jnp.clip(
                             (s[jnp.minimum(bt[b], num_tiles - 1)]
                              + b * chunk
                              - a[jnp.minimum(bt[b], num_tiles - 1)]) // chunk,
                             0, nb_feat - 2))),
            pl.BlockSpec((FEAT, chunk),
                         lambda b, bt, a, c, s: (0, jnp.clip(
                             (s[jnp.minimum(bt[b], num_tiles - 1)]
                              + b * chunk
                              - a[jnp.minimum(bt[b], num_tiles - 1)]) // chunk,
                             0, nb_feat - 2) + 1)),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, PIX),
                         lambda b, bt, *s: (jnp.minimum(bt[b], num_tiles - 1), 0, 0)),
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32)],
    )
    def f(featT):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
                       jax.ShapeDtypeStruct((pb, 1, PIX), jnp.float32)),
        )(btile, astarts, counts, starts, featT, featT)
    return f

base = run("base")
ref_out = jax.jit(base)(featT)
for v in ["base", "rollscan", "scratchcol", "rollscan_scratchcol"]:
    try:
        f = run(v)
        out = jax.jit(f)(featT)
        err = max(float(jnp.abs(a - b).max()) for a, b in
                  zip(jax.tree.leaves(out), jax.tree.leaves(ref_out)))
        timeit(v, f, featT)
        print(f"   max diff vs base: {err:.2e}", flush=True)
    except Exception as e:
        print(v, "FAILED:", str(e)[:300], flush=True)
