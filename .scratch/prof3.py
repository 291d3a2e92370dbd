"""Phase breakdown of the current 1080p/100K fwd+bwd rasterize step."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from scenes import look_at_camera, random_gaussians

W, H, N = 1920, 1080, 100_000
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3)
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = cfg.grid
STEPS = 10

def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a)
            a2[0] = jax.tree.map(
                lambda x: x + (c * 1e-30).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a2[0])
            r = fn(*a2)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(r))
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt

means, cov6, op, rgb = sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"]
bg = jnp.ones(3)

def f_prep(m, c):
    return prep_mod.preprocess(m, c, cam, W, H, opacity=op)
timeit("preprocess fwd", f_prep, means, cov6)
def f_prep_bwd(m, c):
    def g(m, c):
        p = f_prep(m, c)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(p))
    return jax.value_and_grad(g, argnums=(0, 1))(m, c)
timeit("preprocess fwd+bwd", f_prep_bwd, means, cov6)

prep = jax.jit(f_prep)(means, cov6)
prep_s = jax.tree.map(jax.lax.stop_gradient, prep)
n = N
m_cap = cfg.expand_capacity(n); p_cap = cfg.pair_capacity(n)

def f_bin(prep):
    return binning.build_tile_lists(prep, gx, gy, cfg.max_per_tile,
                                    expand_capacity=m_cap,
                                    pair_capacity=p_cap,
                                    chunk=cfg.blend_chunk, opacity=op,
                                    row_capacity=cfg.row_capacity(n))
timeit("binning", f_bin, prep_s)
tiles = jax.jit(f_bin)(prep_s)

def f_feat(prep, o, r):
    return tile_blend.pack_features(prep.mean2d, prep.conic, o.reshape(-1),
                                    r, prep.valid)
feat = jax.jit(f_feat)(prep, op, rgb)

m = tiles.sorted_gid.shape[0]
pad_len = cfg.blend_chunk + (-m - cfg.blend_chunk) % cfg.blend_chunk
gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), n, jnp.int32)])

def f_gather(feat):
    fs = feat[gid_pad]
    fs = jax.lax.optimization_barrier(fs)
    return fs.T
timeit("feat gather + T fwd", f_gather, feat)
featT = jax.jit(f_gather)(feat)

def f_gather_bwd(feat):
    def g(feat):
        fT = f_gather(feat)
        return jnp.sum(fT * fT)
    return jax.value_and_grad(g)(feat)
timeit("feat gather fwd+bwd (scatter-add)", f_gather_bwd, feat)

def f_blend(fT):
    return tile_blend.blend_sorted_pallas(
        fT, tiles.block_tile, tiles.aligned_starts, tiles.starts,
        tiles.counts, tiles.sorted_shift, gx, cfg.num_tiles, p_cap,
        cfg.blend_chunk)
timeit("blend fwd (pallas)", f_blend, featT)

def f_blend_bwd(fT):
    def g(fT):
        c, ft, _ = f_blend(fT)
        return jnp.sum(c * c) + jnp.sum(ft)
    return jax.value_and_grad(g)(fT)
timeit("blend fwd+bwd (pallas)", f_blend_bwd, featT)

# whole thing
def f_full(means, cov6, op, rgb):
    def g(means, cov6, op, rgb):
        out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
        return jnp.sum(out.color * out.color), out.num_rendered
    (l, nr), gr = jax.value_and_grad(g, argnums=(0, 1, 2, 3), has_aux=True)(
        means, cov6, op, rgb)
    return l, nr, gr
timeit("FULL fwd+bwd", f_full, means, cov6, op, rgb)
