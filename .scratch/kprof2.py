"""v2 forward kernel ablation.

variants:
  full      — as shipped
  null      — DMAs + waits only, no math, single dummy write
  nodma     — math on stale buffers, no DMA at all
  oneout    — everything into outA only (outB never written)
  nock      — no ckpt write
  noroll    — skip the roll extraction (use buf directly, wrong values)
"""
import sys, time
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
FEAT, PIX, TILE = tb.FEAT, tb.PIX, tb.TILE
T_EPS = tb.T_EPS
chunk = cfg.blend_chunk
half = chunk // 2

prep = jax.jit(lambda m, c, o: prep_mod.preprocess(
    m, c, cam, WIDTH, HEIGHT, opacity=o))(sc["means3d"], sc["cov6"], sc["opacity"])
n = N
p_cap = cfg.pair_capacity(n)
tiles = jax.jit(lambda p: binning.build_tile_lists(
    p, gx, gy, cfg.max_per_tile, expand_capacity=cfg.expand_capacity(n),
    pair_capacity=p_cap, chunk=chunk, opacity=sc["opacity"],
    row_capacity=cfg.row_capacity(n)))(prep)
feat = jax.jit(lambda pr: tb.pack_features(
    pr.mean2d, pr.conic, sc["opacity"].reshape(-1), sc["rgb"], pr.valid))(prep)
m = tiles.sorted_gid.shape[0]
pad_len = 2 * chunk + (-m) % chunk
gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), n, jnp.int32)])
featT = jnp.asarray(feat[gid_pad].T)
jax.block_until_ready(featT)
num_tiles = cfg.num_tiles
m_pad = featT.shape[1]
pb = p_cap // chunk
print(f"pb={pb} total_aligned={int(tiles.aligned_starts[-1])} "
      f"live_blocks={int(tiles.aligned_starts[-1])//chunk}", flush=True)


def make_kernel(variant):
    def kernel(ht_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               zA_ref, zB_ref, outA_ref, outB_ref, ckpt_ref, carry, buf,
               sem):
        b = pl.program_id(0)
        pbk = pl.num_programs(0)
        h0 = 2 * b
        t0 = ht_ref[h0]
        t1 = ht_ref[h0 + 1]
        prev_t = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 1, 0)], -1)
        prev_even = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 2, 0)], -1)
        next_t = ht_ref[h0 + 2]

        def src0_of(h):
            return tb._half_src0(h, half, ht_ref, astarts_ref, starts_ref,
                                 m_pad, num_tiles)

        if variant != "nodma":
            @pl.when(b == 0)
            def _():
                tb._half_dma(feat_ref, buf, sem, 0, 0, src0_of(0), half).start()
                tb._half_dma(feat_ref, buf, sem, 0, 1, src0_of(1), half).start()

            @pl.when(b + 1 < pbk)
            def _():
                ns = (b + 1) % 2
                tb._half_dma(feat_ref, buf, sem, ns, 0, src0_of(h0 + 2), half).start()
                tb._half_dma(feat_ref, buf, sem, ns, 1, src0_of(h0 + 3), half).start()

            slot = b % 2
            tb._half_dma(feat_ref, buf, sem, slot, 0, src0_of(h0), half).wait()
            tb._half_dma(feat_ref, buf, sem, slot, 1, src0_of(h0 + 1), half).wait()
        else:
            slot = b % 2

        if variant == "null":
            outA_ref[...] = jnp.zeros_like(outA_ref)
            ckpt_ref[...] = jnp.zeros_like(ckpt_ref)
            return

        @pl.when((t0 != prev_even) & (t0 < num_tiles))
        def _initA():
            outA_ref[...] = jnp.zeros_like(outA_ref)

        if variant != "oneout":
            @pl.when((t1 != prev_t) & (t1 < num_tiles))
            def _initB():
                outB_ref[...] = jnp.zeros_like(outB_ref)

        t0c = jnp.clip(t0, 0, num_tiles - 1)
        t1c = jnp.clip(t1, 0, num_tiles - 1)
        if variant == "noroll":
            featw = jnp.concatenate([buf[slot, 0][:, :half],
                                     buf[slot, 1][:, :half]], axis=1)
        else:
            featw = jnp.concatenate(
                [tb._half_extract(buf, slot, 0, src0_of(h0), half),
                 tb._half_extract(buf, slot, 1, src0_of(h0 + 1), half)], axis=1)
        ox = tb._lane_mix(half, chunk, (t0c % gx) * TILE, (t1c % gx) * TILE)
        oy = tb._lane_mix(half, chunk, (t0c // gx) * TILE, (t1c // gx) * TILE)
        alpha, gate, _, _, _ = tb._alphas_mxu_lanes(featw, ox, oy)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        rem0 = counts_ref[t0c] - (h0 * half - astarts_ref[t0c])
        rem1 = counts_ref[t1c] - ((h0 + 1) * half - astarts_ref[t1c])
        pos = jnp.where(lane < half, lane, lane - half)
        live = (pos < tb._lane_mix(half, chunk, rem0, rem1, jnp.int32)
                ) & (tb._lane_mix(half, chunk, t0, t1, jnp.int32) < num_tiles)
        alpha = jnp.where(gate & live, alpha, 0.0)

        s_prev = carry[0, :]
        sA_in = jnp.where(t0 != prev_t, jnp.ones_like(s_prev), s_prev)
        if variant != "nock":
            ckpt_ref[0, 0, :] = sA_in

        omA = 1.0 - alpha[:, :half]
        cumA = tb._cumprod_lanes(omA)
        sA = sA_in[:, None] * cumA
        inclA = sA >= T_EPS
        wA = alpha[:, :half] * (sA_in[:, None] * tb._shift_one_lane(cumA, 1.0)) * inclA
        sA_end = sA[:, half - 1]

        sB_in = jnp.where(t1 != t0, jnp.ones_like(sA_end), sA_end)
        if variant != "nock":
            ckpt_ref[0, 1, :] = sB_in

        omB = 1.0 - alpha[:, half:]
        cumB = tb._cumprod_lanes(omB)
        sB = sB_in[:, None] * cumB
        inclB = sB >= T_EPS
        wB = alpha[:, half:] * (sB_in[:, None] * tb._shift_one_lane(cumB, 1.0)) * inclB
        carry[0, :] = sB[:, half - 1]

        @pl.when(t0 < num_tiles)
        def _accumA():
            colors = jax.lax.dot_general(
                featw[tb.ROW_R:tb.ROW_B + 1, :half], wA, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            outA_ref[0, 0:3, :] += colors

        if variant == "oneout":
            @pl.when(t1 < num_tiles)
            def _accumB1():
                colors = jax.lax.dot_general(
                    featw[tb.ROW_R:tb.ROW_B + 1, half:], wB, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outA_ref[0, 0:3, :] += colors
        else:
            @pl.when(t1 < num_tiles)
            def _accumB():
                colors = jax.lax.dot_general(
                    featw[tb.ROW_R:tb.ROW_B + 1, half:], wB, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outB_ref[0, 0:3, :] += colors

        ftA_reset = jnp.where(t0 != prev_t, jnp.ones_like(s_prev), carry[1, :])
        ftA = ftA_reset * jnp.min(jnp.where(inclA, cumA, 1.0), axis=1)

        @pl.when((t1 != t0) & (t0 < num_tiles))
        def _closeA():
            outA_ref[0, 3, :] = ftA

        ftB_reset = jnp.where(t1 != t0, jnp.ones_like(s_prev), ftA)
        ftB = ftB_reset * jnp.min(jnp.where(inclB, cumB, 1.0), axis=1)
        carry[1, :] = ftB

        @pl.when((next_t != t1) & (t1 < num_tiles))
        def _closeB():
            if variant == "oneout":
                outA_ref[0, 3, :] = ftB
            else:
                outB_ref[0, 3, :] = ftB

    return kernel


def run_variant(variant):
    kernel = make_kernel(variant)

    def out_spec(parity):
        return pl.BlockSpec((1, 8, PIX),
                            lambda b, ht, *s: (ht[2 * b + parity], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(
            out_spec(0),
            out_spec(1),
            pl.BlockSpec((1, 2, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, 2, FEAT, 2 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    zeros_out = jnp.zeros((num_tiles + 1, 8, PIX), jnp.float32)
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles + 1, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((pb, 2, PIX), jnp.float32),
        ),
        input_output_aliases={5: 0, 6: 1},
    )

    @jax.jit
    def loop(fT):
        def body(carry, _):
            outA, outB, ckpt = call(
                tiles.block_tile, tiles.aligned_starts, tiles.counts,
                tiles.starts, fT + carry * 1e-30, zeros_out, zeros_out)
            return jnp.sum(outA[:, 0]) * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
        return out

    out = loop(featT); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(featT); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{variant:12s} {dt:7.2f} ms   ({dt*1e6/pb:6.0f} ns/block)", flush=True)


variants = sys.argv[1:] or ["full", "oneout", "nock", "noroll", "null", "nodma"]
for v in variants:
    run_variant(v)
