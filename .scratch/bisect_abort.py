"""Bisect the scan>=2 abort: which stage kills the backend?

usage: bisect_abort.py MODE STEPS
MODE: fwd | fwdbwd | blendonly | blendbwd
"""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from scenes import look_at_camera, random_gaussians

WIDTH, HEIGHT = 1920, 1080
N = 100_000
cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3, use_pallas=True)
cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
bg = jnp.ones(3)
mode = sys.argv[1]
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

if mode in ("fwd", "fwdbwd", "rgbgrad", "meangrad", "opgrad", "covgrad"):
    def one(means, cov6, op, rgb):
        out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
        return jnp.sum(out.color * out.color)

    @jax.jit
    def loop(means, cov6, op, rgb):
        def body(carry, _):
            if mode == "fwd":
                loss = one(means + carry * 1e-30, cov6, op, rgb)
                return loss, loss
            argn = {"fwdbwd": (0, 1, 2, 3), "rgbgrad": (3,),
                    "meangrad": (0,), "opgrad": (2,), "covgrad": (1,)}[mode]
            loss, grads = jax.value_and_grad(one, argnums=argn)(
                means + carry * 1e-30, cov6, op, rgb)
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
            return loss + gsum * 1e-30, loss
        return jax.lax.scan(body, 0.0, None, length=steps)

    args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"])
else:
    # precompute binning once OUTSIDE the loop, scan only the blend
    gx, gy = cfg.grid
    prep = prep_mod.preprocess(sc["means3d"], sc["cov6"], cam, WIDTH, HEIGHT,
                               opacity=sc["opacity"])
    n = N
    p_cap = cfg.pair_capacity(n)
    tiles = binning.build_tile_lists(
        prep, gx, gy, cfg.max_per_tile,
        expand_capacity=cfg.expand_capacity(n), pair_capacity=p_cap,
        chunk=cfg.blend_chunk, opacity=sc["opacity"],
        row_capacity=cfg.row_capacity(n))
    feat = tile_blend.pack_features(prep.mean2d, prep.conic,
                                    sc["opacity"].reshape(-1), sc["rgb"],
                                    prep.valid)
    m = tiles.sorted_gid.shape[0]
    pad_len = cfg.blend_chunk + (-m - cfg.blend_chunk) % cfg.blend_chunk
    gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), n, jnp.int32)])
    feat_sortedT = jnp.asarray(feat[gid_pad].T)
    jax.block_until_ready(feat_sortedT)
    print(f"setup done: m={m} p_cap={p_cap}", flush=True)

    exp = binning.expand_pairs(prep, gx, gy, cfg.expand_capacity(n),
                               opacity=sc["opacity"],
                               row_capacity=cfg.row_capacity(n))

    @jax.jit
    def loop(fT):
        def body(carry, _):
            icarry = (carry * 0.0).astype(jnp.int32)
            if mode in ("blendbwd_sortloop", "blendbwd_finloop"):
                if mode == "blendbwd_sortloop":
                    s_tile, _, s_gid = jax.lax.sort(
                        (exp.pair_tile + icarry, exp.pair_depth,
                         exp.gid_slot), num_keys=2, is_stable=True)
                else:
                    s_tile, _, s_gid = jax.lax.sort(
                        (exp.pair_tile, exp.pair_depth, exp.gid_slot),
                        num_keys=2, is_stable=True)
                    s_tile = jax.lax.stop_gradient(s_tile)
                tl = binning.finish_tile_lists(
                    s_tile + icarry, s_gid, exp.num_valid,
                    exp.rect_overflow, cfg.num_tiles, cfg.max_per_tile,
                    p_cap, cfg.blend_chunk)
                gp = jnp.concatenate([tl.sorted_gid,
                                      jnp.full((pad_len,), n, jnp.int32)])
                fT2 = jnp.asarray(feat)[gp].T + carry * 1e-30
                def f(fT):
                    color, final_t, ncon = tile_blend.blend_sorted_pallas(
                        fT, tl.block_tile, tl.aligned_starts,
                        tl.starts, tl.counts, tl.sorted_shift,
                        gx, cfg.num_tiles, p_cap, cfg.blend_chunk,
                        with_contrib=False)
                    return jnp.sum(color * color) + jnp.sum(final_t)
                loss, g = jax.value_and_grad(f)(fT2)
                return loss + jnp.sum(g) * 1e-30, loss
            if mode == "blendbwd_scal":
                tl = tiles._replace(
                    block_tile=tiles.block_tile + icarry,
                    aligned_starts=tiles.aligned_starts + icarry,
                    starts=tiles.starts + icarry,
                    counts=tiles.counts + icarry)
            else:
                tl = tiles
            if mode == "blendbwd_gather":
                fT2 = jnp.asarray(feat)[gid_pad].T + carry * 1e-30
            else:
                fT2 = fT
            def f(fT):
                color, final_t, ncon = tile_blend.blend_sorted_pallas(
                    fT, tl.block_tile, tl.aligned_starts,
                    tl.starts, tl.counts, tl.sorted_shift,
                    gx, cfg.num_tiles, p_cap, cfg.blend_chunk,
                    with_contrib=False)
                return jnp.sum(color * color) + jnp.sum(final_t)
            if mode == "blendonly":
                loss = f(fT2 + carry * 1e-30)
                return loss, loss
            loss, g = jax.value_and_grad(f)(fT2 + carry * 1e-30)
            return loss + jnp.sum(g) * 1e-30, loss
        return jax.lax.scan(body, 0.0, None, length=steps)

    args = (feat_sortedT,)

print(f"mode={mode} steps={steps}: run...", flush=True)
out = loop(*args)
jax.block_until_ready(out)
print(f"OK: {float(out[0]):.6g}", flush=True)
t0 = time.perf_counter()
out = loop(*args)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / steps
print(f"step_ms={dt*1e3:.2f}", flush=True)
