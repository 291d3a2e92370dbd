"""v3 fwd kernel ablation: where do the 2.08us/block go?"""
import sys, time, functools, math
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend as tb
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from scenes import look_at_camera, random_gaussians

WIDTH, HEIGHT = 1920, 1080
N = 100_000; STEPS = 10
cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3, use_pallas=True)
cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = cfg.grid
FEAT, PIX, TILE = tb.FEAT, tb.PIX, tb.TILE
chunk = cfg.blend_chunk; half = chunk // 2

prep = jax.jit(lambda m, c, o: prep_mod.preprocess(
    m, c, cam, WIDTH, HEIGHT, opacity=o))(sc["means3d"], sc["cov6"], sc["opacity"])
p_cap = cfg.pair_capacity(N)
tiles = jax.jit(lambda p: binning.build_tile_lists(
    p, gx, gy, cfg.max_per_tile, expand_capacity=cfg.expand_capacity(N),
    pair_capacity=p_cap, chunk=chunk, opacity=sc["opacity"],
    row_capacity=cfg.row_capacity(N)))(prep)
feat = jax.jit(lambda pr: tb.pack_features(
    pr.mean2d, pr.conic, sc["opacity"].reshape(-1), sc["rgb"], pr.valid))(prep)
m = tiles.sorted_gid.shape[0]
pad_len = 2 * chunk + (-m) % chunk
gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), N, jnp.int32)])
featT = jax.jit(lambda f, g: f[g].T)(feat, gid_pad)
m_pad = featT.shape[1]
pb = p_cap // chunk
num_tiles = cfg.num_tiles
print("pb", pb, "live", int((tiles.aligned_starts[-1]+chunk-1)//chunk))

def make_kernel(variant):
    def kernel(ht_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               zA_ref, zB_ref, outA_ref, outB_ref, ckpt_ref, carry, buf, sem):
        b = pl.program_id(0); pbn = pl.num_programs(0)
        h0 = 2 * b
        t0 = ht_ref[h0]; t1 = ht_ref[h0 + 1]
        prev_t = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 1, 0)], -1)
        prev_even = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 2, 0)], -1)
        next_t = ht_ref[h0 + 2]
        def src0_of(h):
            return tb._half_src0(h, half, ht_ref, astarts_ref, starts_ref, m_pad, num_tiles)
        @pl.when(b == 0)
        def _p():
            tb._half_dma(feat_ref, buf, sem, 0, 0, src0_of(0), half).start()
            tb._half_dma(feat_ref, buf, sem, 0, 1, src0_of(1), half).start()
        @pl.when(b + 1 < pbn)
        def _f():
            ns = (b + 1) % 2
            tb._half_dma(feat_ref, buf, sem, ns, 0, src0_of(h0+2), half).start()
            tb._half_dma(feat_ref, buf, sem, ns, 1, src0_of(h0+3), half).start()
        slot = b % 2
        tb._half_dma(feat_ref, buf, sem, slot, 0, src0_of(h0), half).wait()
        tb._half_dma(feat_ref, buf, sem, slot, 1, src0_of(h0+1), half).wait()
        @pl.when(t0 < num_tiles)
        def _live():
            t0c = jnp.clip(t0, 0, num_tiles - 1); t1c = jnp.clip(t1, 0, num_tiles - 1)
            if variant == "noroll":
                featw = jnp.concatenate([buf[slot,0][:, :half], buf[slot,1][:, :half]], axis=1)
            else:
                featw = jnp.concatenate(
                    [tb._half_extract(buf, slot, 0, src0_of(h0), half),
                     tb._half_extract(buf, slot, 1, src0_of(h0+1), half)], axis=1)
            ox = tb._lane_mix(half, chunk, (t0c % gx) * TILE, (t1c % gx) * TILE)
            oy = tb._lane_mix(half, chunk, (t0c // gx) * TILE, (t1c // gx) * TILE)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            rem0 = counts_ref[t0c] - (h0 * half - astarts_ref[t0c])
            rem1 = counts_ref[t1c] - ((h0+1) * half - astarts_ref[t1c])
            pos = jnp.where(lane < half, lane, lane - half)
            live = (pos < tb._lane_mix(half, chunk, rem0, rem1, jnp.int32)
                    ) & (tb._lane_mix(half, chunk, t0, t1, jnp.int32) < num_tiles)
            if variant == "nomix":
                ox = jnp.full((1, chunk), 100.0); oy = ox
                live = lane < chunk
            if variant == "noq":
                raw_t = featw[:, :PIX] * 1e-9 + 0.5  # (chunk? no) fake
                raw_t = jnp.zeros((chunk, PIX), jnp.float32) + featw[0, 0] * 1e-9 + 0.5
            else:
                x = featw[tb.ROW_X][None, :] - ox
                y = featw[tb.ROW_Y][None, :] - oy
                ca = featw[tb.ROW_CA][None, :]; cb = featw[tb.ROW_CB][None, :]; cc = featw[tb.ROW_CC][None, :]
                log_op = jnp.log(jnp.maximum(featw[tb.ROW_OP][None, :], 1e-30))
                q0 = -0.5 * (ca*x*x + cc*y*y) - cb*x*y + log_op
                q0 = jnp.where(live, q0, tb._DEAD_Q0)
                q1 = ca*x + cb*y; q2 = cb*x + cc*y
                zero = jnp.zeros_like(x)
                q = jnp.concatenate([q0, q1, q2, -0.5*ca, -cb, -0.5*cc, zero, zero])
                power_t = jax.lax.dot_general(q, tb._pix_basis(), (((0,), (1,)), ((), ())),
                                              preferred_element_type=jnp.float32)
                if variant == "noexp":
                    raw_t = power_t * 0.001 + 0.3
                else:
                    raw_t = jnp.exp(power_t)
            alpha_t = jnp.where(raw_t >= tb.ALPHA_MIN, jnp.minimum(raw_t, tb.ALPHA_MAX), 0.0)
            s_prev = carry[0, :]
            sA_in = jnp.where(t0 != prev_t, jnp.ones_like(s_prev), s_prev)
            ckpt_ref[0, 0, :] = sA_in
            if variant == "noscan":
                cumA = 1.0 - alpha_t[:half]; sA = sA_in[None, :] * cumA
                inclA = sA >= tb.T_EPS
                wA = alpha_t[:half] * sA_in[None, :] * inclA
                sA_end = sA[half-1]
            else:
                omA = 1.0 - alpha_t[:half]
                cumA = tb._cumprod_sublanes(omA)
                sA = sA_in[None, :] * cumA
                inclA = sA >= tb.T_EPS
                wA = alpha_t[:half] * (sA_in[None, :] * tb._shift_one_sublane(cumA, 1.0)) * inclA
                sA_end = sA[half-1]
            sB_in = jnp.where(t1 != t0, jnp.ones_like(sA_end), sA_end)
            ckpt_ref[0, 1, :] = sB_in
            if variant == "noscan":
                cumB = 1.0 - alpha_t[half:]; sB = sB_in[None, :] * cumB
                inclB = sB >= tb.T_EPS
                wB = alpha_t[half:] * sB_in[None, :] * inclB
            else:
                omB = 1.0 - alpha_t[half:]
                cumB = tb._cumprod_sublanes(omB)
                sB = sB_in[None, :] * cumB
                inclB = sB >= tb.T_EPS
                wB = alpha_t[half:] * (sB_in[None, :] * tb._shift_one_sublane(cumB, 1.0)) * inclB
            carry[0, :] = sB[half-1]
            @pl.when(t0 != prev_even)
            def _iA(): outA_ref[...] = jnp.zeros_like(outA_ref)
            @pl.when(t1 != prev_t)
            def _iB(): outB_ref[...] = jnp.zeros_like(outB_ref)
            if variant != "nocolor":
                @pl.when(t0 < num_tiles)
                def _aA():
                    colors = jax.lax.dot_general(featw[tb.ROW_R:tb.ROW_B+1, :half], wA,
                                                 (((1,), (0,)), ((), ())),
                                                 preferred_element_type=jnp.float32)
                    outA_ref[0, 0:3, :] += colors
                @pl.when(t1 < num_tiles)
                def _aB():
                    colors = jax.lax.dot_general(featw[tb.ROW_R:tb.ROW_B+1, half:], wB,
                                                 (((1,), (0,)), ((), ())),
                                                 preferred_element_type=jnp.float32)
                    outB_ref[0, 0:3, :] += colors
            ftA_reset = jnp.where(t0 != prev_t, jnp.ones_like(s_prev), carry[1, :])
            ftA = ftA_reset * jnp.min(jnp.where(inclA, cumA, 1.0), axis=0)
            @pl.when((t1 != t0) & (t0 < num_tiles))
            def _cA():
                outA_ref[0, 3, :] = ftA
            ftB_reset = jnp.where(t1 != t0, jnp.ones_like(s_prev), ftA)
            ftB = ftB_reset * jnp.min(jnp.where(inclB, cumB, 1.0), axis=0)
            carry[1, :] = ftB
            @pl.when((next_t != t1) & (t1 < num_tiles))
            def _cB():
                outB_ref[0, 3, :] = ftB
    return kernel

def run(variant):
    kernel = make_kernel(variant)
    def out_spec(parity):
        return pl.BlockSpec((1, 8, PIX), lambda b, ht, *s: (ht[2*b+parity], 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(pb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(out_spec(0), out_spec(1),
                   pl.BlockSpec((1, 2, PIX), lambda b, *s: (b, 0, 0))),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32),
                        pltpu.VMEM((2, 2, FEAT, 2*chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))])
    zeros_out = jnp.zeros((num_tiles + 1, 8, PIX), jnp.float32)
    @jax.jit
    def go(ft):
        outA, outB, ck = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((num_tiles+1, 8, PIX), jnp.float32),
                       jax.ShapeDtypeStruct((num_tiles+1, 8, PIX), jnp.float32),
                       jax.ShapeDtypeStruct((pb, 2, PIX), jnp.float32)),
            input_output_aliases={5: 0, 6: 1},
        )(tiles.block_tile.astype(jnp.int32), tiles.aligned_starts.astype(jnp.int32),
          tiles.counts.astype(jnp.int32), tiles.starts.astype(jnp.int32), ft,
          zeros_out, zeros_out)
        return outA[:8] + outB[:8]
    @jax.jit
    def loop(ft):
        def body(c, _):
            o = go(ft + c * 1e-30)
            return jnp.sum(o) * 1e-30 + c, None
        out, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return out
    r = loop(featT); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = loop(featT); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{variant:10s} {dt:7.2f} ms  ({dt*1e6/pb:6.0f} ns/block)", flush=True)

for v in ["full", "noroll", "nomix", "noexp", "noscan", "nocolor", "noq"]:
    run(v)
