import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from scenes import look_at_camera, random_gaussians
W,H,N=1920,1080,100_000
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=12)
cam = look_at_camera(W,H,distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004,0.02))
gx, gy = cfg.grid
STEPS=10
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a)
            a2[0] = jax.tree.map(
                lambda x: x + (c*1e-30).astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, a2[0])
            r = fn(*a2)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(r))
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

means, cov6, op, rgb = sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"]
def f_prep(m, c): return prep_mod.preprocess(m, c, cam, W, H)
prep = jax.jit(f_prep)(means, cov6)
prep_s = jax.tree.map(jax.lax.stop_gradient, prep)
m_cap = cfg.expand_capacity(N); p_cap = cfg.pair_capacity(N)
print("m_cap", m_cap, "p_cap", p_cap, flush=True)

def f_bin(prep):
    return binning.build_tile_lists(prep, gx, gy, cfg.max_per_tile,
                                    expand_capacity=m_cap, pair_capacity=p_cap,
                                    chunk=cfg.blend_chunk, opacity=op)
timeit("binning (new)", f_bin, prep_s)
tiles = jax.jit(f_bin)(prep_s)

def f_feat(prep, o, r):
    return tile_blend.pack_features(prep.mean2d, prep.conic, o.reshape(-1), r, prep.valid)
feat = jax.jit(f_feat)(prep, op, rgb)

def f_gathers(feat):
    fs = feat[tiles.sorted_gid]
    return binning.relocate_aligned(fs, tiles.aligned_src, tiles.sorted_shift, p_cap)
timeit("feat gather + relocate fwd", f_gathers, feat)
pair_feats = jax.jit(f_gathers)(feat)
pair_featsT = jnp.asarray(pair_feats.T)

def f_gathers_bwd(feat):
    def g(feat):
        pf = f_gathers(feat)
        return jnp.sum(pf * pf)
    return jax.value_and_grad(g)(feat)
timeit("gathers fwd+bwd (incl scatter-add)", f_gathers_bwd, feat)

def f_blend_fwd(pT):
    return tile_blend.blend_pairs_pallas(pT, tiles.block_tile,
                                         tiles.aligned_starts, tiles.counts,
                                         gx, cfg.num_tiles, cfg.blend_chunk)
timeit("blend fwd (pallas c128)", f_blend_fwd, pair_featsT)
def f_blend_fwdbwd(pT):
    def g(pT):
        c, ft, _ = f_blend_fwd(pT)
        return jnp.sum(c * c) + jnp.sum(ft)
    return jax.value_and_grad(g)(pT)
timeit("blend fwd+bwd (pallas c128)", f_blend_fwdbwd, pair_featsT)
