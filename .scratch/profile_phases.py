"""Phase breakdown of the 1080p/100K fwd+bwd rasterize step on real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from scenes import look_at_camera, random_gaussians

W, H, N = 1920, 1080, 100_000
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                       max_tiles_per_gaussian=32, blend_chunk=256)
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
bg = jnp.ones(3)
gx, gy = cfg.grid

STEPS = 10

def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            # thread carry into the first float arg: forces re-execution
            a2 = list(a)
            a2[0] = jax.tree.map(
                lambda x: x + c * 1e-30 if jnp.issubdtype(x.dtype, jnp.floating) else x,
                a2[0])
            r = fn(*a2)
            leaves = jax.tree.leaves(r)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                    if hasattr(l, 'astype'))
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(*args); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:38s} {dt:8.2f} ms")
    return dt

means, cov6, op, rgb = sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"]

# phase 1: preprocess fwd
def f_prep(m, c):
    return prep_mod.preprocess(m, c, cam, W, H)
timeit("preprocess fwd", f_prep, means, cov6)

prep = jax.jit(f_prep)(means, cov6)
prep_s = jax.tree.map(jax.lax.stop_gradient, prep)
n = N
p_cap = (n * cfg.pair_capacity_per_gaussian
         + cfg.num_tiles * (cfg.blend_chunk // 2))
p_cap = -(-p_cap // cfg.blend_chunk) * cfg.blend_chunk

def f_bin(prep):
    return binning.build_tile_lists(prep, gx, gy, cfg.max_per_tile,
                                    cfg.max_tiles_per_gaussian,
                                    pair_capacity=p_cap, chunk=cfg.blend_chunk)
timeit("binning", f_bin, prep_s)

tiles = jax.jit(f_bin)(prep_s)

def f_feat(prep, op, rgb):
    return tile_blend.pack_features(prep.mean2d, prep.conic, op.reshape(-1),
                                    rgb, prep.valid)
feat = jax.jit(f_feat)(prep, op, rgb)

def f_gather(feat):
    return feat[tiles.aligned_gid]
timeit("pair gather fwd", f_gather, feat)

pair_feats = jax.jit(f_gather)(feat)
pair_featsT = jnp.asarray(pair_feats.T)

def f_blend_fwd(pT):
    return tile_blend.blend_pairs_pallas(pT, tiles.block_tile,
                                         tiles.aligned_starts, tiles.counts,
                                         gx, cfg.num_tiles, cfg.blend_chunk)
timeit("blend fwd (pallas)", f_blend_fwd, pair_featsT)

def f_blend_fwdbwd(pT):
    def g(pT):
        c, ft, _ = f_blend_fwd(pT)
        return jnp.sum(c * c) + jnp.sum(ft)
    return jax.value_and_grad(g)(pT)
timeit("blend fwd+bwd (pallas)", f_blend_fwdbwd, pair_featsT)

def f_segsum(d_pair):
    nf = feat.shape[1]
    return jnp.zeros((N + 1, nf), jnp.float32).at[tiles.aligned_gid].add(
        d_pair, mode="drop")
timeit("pair-grad segment-sum (scatter-add)", f_segsum, pair_feats)

def f_prep_bwd(m, c, o, r):
    def g(m, c, o, r):
        p = prep_mod.preprocess(m, c, cam, W, H)
        ft = tile_blend.pack_features(p.mean2d, p.conic, o.reshape(-1), r,
                                      p.valid)
        return jnp.sum(ft * ft)
    return jax.value_and_grad(g, argnums=(0, 1, 2, 3))(m, c, o, r)
timeit("preprocess fwd+bwd (autodiff)", f_prep_bwd, means, cov6, op, rgb)

# whole thing for reference
def f_full(m, c, o, r):
    def g(m, c, o, r):
        out = rasterize(m, c, o, r, bg, cam, cfg)
        return jnp.sum(out.color * out.color), out.num_rendered
    (l, nr), gr = jax.value_and_grad(g, argnums=(0, 1, 2, 3),
                                     has_aux=True)(m, c, o, r)
    return l, gr
timeit("FULL fwd+bwd", f_full, means, cov6, op, rgb)
