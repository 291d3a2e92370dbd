"""Forward blend kernel ablation: where do the 26ms go?

usage: kprof.py [variant ...]   (default: all)
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend as tb
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from scenes import look_at_camera, random_gaussians

WIDTH, HEIGHT = 1920, 1080
N = 100_000
STEPS = 10
cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3, use_pallas=True)
cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = cfg.grid
FEAT, PIX = tb.FEAT, tb.PIX
T_EPS = tb.T_EPS

prep = jax.jit(lambda m, c, o: prep_mod.preprocess(
    m, c, cam, WIDTH, HEIGHT, opacity=o))(sc["means3d"], sc["cov6"], sc["opacity"])
n = N
p_cap = cfg.pair_capacity(n)
tiles = jax.jit(lambda p: binning.build_tile_lists(
    p, gx, gy, cfg.max_per_tile, expand_capacity=cfg.expand_capacity(n),
    pair_capacity=p_cap, chunk=cfg.blend_chunk, opacity=sc["opacity"],
    row_capacity=cfg.row_capacity(n)))(prep)
feat = jax.jit(lambda pr: tb.pack_features(
    pr.mean2d, pr.conic, sc["opacity"].reshape(-1), sc["rgb"], pr.valid))(prep)
m = tiles.sorted_gid.shape[0]
chunk = cfg.blend_chunk
pad_len = 2 * chunk + (-m) % chunk
gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), n, jnp.int32)])
featT = jnp.asarray(feat[gid_pad].T)
jax.block_until_ready(featT)
num_tiles = cfg.num_tiles
m_pad = featT.shape[1]
pb = p_cap // chunk


def make_kernel(variant):
    wc = False
    def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               out_ref, ckpt_ref, carry, buf, sem):
        b = pl.program_id(0)
        pbk = pl.num_programs(0)
        t = btile_ref[b]
        prev_t = jnp.where(b > 0, btile_ref[jnp.maximum(b - 1, 0)], -1)
        next_t = btile_ref[b + 1]

        def src0_of(bb):
            return tb._sorted_src0(bb, chunk, btile_ref, astarts_ref,
                                   starts_ref, m_pad, num_tiles)

        if variant != "nodma":
            @pl.when(b == 0)
            def _():
                tb._window_dma(feat_ref, buf, sem, 0, src0_of(0), chunk).start()
            @pl.when(b + 1 < pbk)
            def _():
                tb._window_dma(feat_ref, buf, sem, (b + 1) % 2,
                               src0_of(b + 1), chunk).start()
            tb._window_dma(feat_ref, buf, sem, b % 2, src0_of(b), chunk).wait()

        @pl.when(t < num_tiles)
        def _valid():
            @pl.when(t != prev_t)
            def _first():
                carry[...] = jnp.ones_like(carry)
                carry[2, :] = jnp.zeros_like(carry[2, :])
                out_ref[...] = jnp.zeros_like(out_ref)

            s_in = carry[0, :]
            ckpt_ref[0, 0, :] = s_in
            if variant == "null" or variant == "nodma":
                return

            def _work():
                tile_x = t % gx
                tile_y = t // gx
                if variant == "noroll":
                    feat_w = buf[b % 2][:, :chunk]
                else:
                    feat_w = tb._window_extract(buf, b % 2, src0_of(b), chunk)
                if variant == "noalpha":
                    alpha = feat_w[:8].repeat(32, axis=0) * 1e-6
                else:
                    alpha, _, _, _, _ = tb._alphas_mxu(feat_w, tile_x, tile_y)
                live_lane = tb._sorted_alpha_mask(b, chunk, astarts_ref,
                                                  counts_ref, t)
                alpha = jnp.where(live_lane, alpha, 0.0)

                om = 1.0 - alpha
                if variant == "noscan":
                    local_cum = om
                    s = s_in[:, None] * local_cum
                    s_excl = s_in[:, None] * om
                else:
                    local_cum = tb._cumprod_lanes(om)
                    s = s_in[:, None] * local_cum
                    s_excl = s_in[:, None] * tb._shift_one_lane(local_cum, 1.0)
                include = s >= T_EPS
                w = alpha * s_excl * include

                rgb3 = feat_w[tb.ROW_R:tb.ROW_B + 1]
                colors3 = jax.lax.dot_general(
                    rgb3, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, 0:3, :] += colors3

                carry[0, :] = s[:, s.shape[1] - 1]
                s_last_inc = jnp.min(jnp.where(include, local_cum, 1.0), axis=1)
                carry[1, :] *= s_last_inc

            pl.when(jnp.max(s_in) >= T_EPS)(_work)

            @pl.when(t != next_t)
            def _last():
                out_ref[0, 3, :] = carry[1, :]
                out_ref[0, tb.NCONTRIB_ROW, :] = carry[2, :]
    return kernel


def run_variant(variant):
    kernel = make_kernel(variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, 8, PIX),
                         lambda b, btile, *s: (jnp.minimum(btile[b], num_tiles - 1), 0, 0)),
            pl.BlockSpec((1, 1, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, FEAT, 2 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((pb, 1, PIX), jnp.float32),
        ))

    @jax.jit
    def loop(fT):
        def body(carry, _):
            out8, ckpt = call(tiles.block_tile, tiles.aligned_starts,
                              tiles.counts, tiles.starts, fT + carry * 1e-30)
            return jnp.sum(out8[:, 0]) * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
        return out

    out = loop(featT); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(featT); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{variant:12s} {dt:7.2f} ms   ({dt*1e6/pb:6.0f} ns/block)", flush=True)


variants = sys.argv[1:] or ["full", "noroll", "noalpha", "noscan", "null", "nodma"]
print(f"pb={pb} blocks, live pairs={int(tiles.num_rendered)}", flush=True)
for v in variants:
    run_variant(v)
