"""Decompose the non-blend backward: scatter-add VJP, q-chain, preprocess."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from scenes import look_at_camera, random_gaussians

WIDTH, HEIGHT = 1920, 1080
N = 100_000; STEPS = 10
cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3, use_pallas=True)
cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = cfg.grid

prep = jax.jit(lambda m, c, o: prep_mod.preprocess(
    m, c, cam, WIDTH, HEIGHT, opacity=o))(sc["means3d"], sc["cov6"], sc["opacity"])
p_cap = cfg.pair_capacity(N)
tiles = jax.jit(lambda p: binning.build_tile_lists(
    p, gx, gy, cfg.max_per_tile, expand_capacity=cfg.expand_capacity(N),
    pair_capacity=p_cap, chunk=cfg.blend_chunk, opacity=sc["opacity"],
    row_capacity=cfg.row_capacity(N)))(prep)
feat = jax.jit(lambda pr: tile_blend.pack_features(
    pr.mean2d, pr.conic, sc["opacity"].reshape(-1), sc["rgb"], pr.valid))(prep)
m = tiles.sorted_gid.shape[0]
pad_len = 2 * cfg.blend_chunk + (-m) % cfg.blend_chunk
gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), N, jnp.int32)])
tile_pad = jnp.concatenate([tiles.sorted_tile,
                            jnp.full((pad_len,), cfg.num_tiles, jnp.int32)])
live_pad = jnp.concatenate([tiles.in_count, jnp.zeros((pad_len,), bool)])
rng = np.random.default_rng(0)
dq = jnp.asarray(rng.normal(size=(m + pad_len, 16)).astype(np.float32))

_OH = None
def overhead():
    global _OH
    if _OH is None:
        @jax.jit
        def empty(x):
            return jax.lax.scan(lambda c, _: (c + x*1e-30, None),
                                jnp.float32(0.), None, length=STEPS)[0]
        x = jnp.float32(1.)
        jax.block_until_ready(empty(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(empty(x))
            ts.append((time.perf_counter()-t0)*1e3)
        _OH = min(ts)
    return _OH

def timed(name, fn, *args, grad_wrt=None):
    if grad_wrt is not None:
        vg = jax.value_and_grad(fn, argnums=grad_wrt)
        def step(*a):
            v, g = vg(*a)
            return v + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-30
    else:
        def step(*a):
            out = fn(*a)
            return sum(jnp.sum(jnp.asarray(x, jnp.float32) * 1e-30)
                       for x in jax.tree.leaves(out))
    @jax.jit
    def loop(*a):
        def body(c, _):
            first = a[0]
            eps = ((c*1e-30).astype(first.dtype) if jnp.issubdtype(first.dtype, jnp.integer)
                   else jnp.asarray(c*1e-30, first.dtype))
            return jnp.float32(step(first + eps, *a[1:])), None
        return jax.lax.scan(body, jnp.float32(0.), None, length=STEPS)[0]
    r = loop(*args); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = loop(*args); jax.block_until_ready(r)
    dt = ((time.perf_counter()-t0)*1e3 - overhead()) / STEPS
    print(f"{name:46s} {dt:7.2f} ms", flush=True)

# 1. scatter-add: VJP of feat[gid_pad] alone
timed("scatter-add dfeat (tile-order gids, m rows)",
      lambda d: jnp.zeros((N+1, 16)).at[gid_pad].add(d), dq)
gid_sorted = jnp.sort(gid_pad)
timed("scatter-add dfeat (SORTED gids, m rows)",
      lambda d: jnp.zeros((N+1, 16)).at[gid_sorted].add(d), dq)
# sort-based alternative: sort by gid, cumsum, boundary diff
def segsum(d):
    sg, perm = jax.lax.sort((gid_pad, jnp.arange(d.shape[0], dtype=jnp.int32)),
                            num_keys=1, is_stable=True)
    ds = d[perm]
    cs = jnp.cumsum(ds, axis=0)
    ends = binning._tile_starts(sg, N + 1)  # first idx with gid >= t
    csz = jnp.concatenate([jnp.zeros((1, 16)), cs])
    return csz[ends[1:]] - csz[ends[:-1]]
timed("sort+cumsum segment-sum (m rows)", segsum, dq)
# 2. q-chain backward alone (gather + build, differentiated)
def qchain(f):
    q = tile_blend.build_qtable(f[gid_pad], tile_pad, live_pad, gx)
    return jnp.sum(q * dq)
timed("qtable gather+build fwd+bwd", qchain, feat, grad_wrt=0)
# 3. preprocess fwd+bwd
def pp(mm):
    pr = prep_mod.preprocess(mm, sc["cov6"], cam, WIDTH, HEIGHT,
                             opacity=sc["opacity"])
    return jnp.sum(pr.mean2d * pr.mean2d) + jnp.sum(pr.conic)
timed("preprocess fwd+bwd", pp, sc["means3d"], grad_wrt=0)
