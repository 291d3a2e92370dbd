"""Time blend fwd / fwd+bwd at several chunk sizes in one process."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from scenes import look_at_camera, random_gaussians

W, H, N, STEPS = 1920, 1080, 100_000, 10
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))

_OVH = None
def overhead():
    global _OVH
    if _OVH is None:
        @jax.jit
        def empty(x):
            out, _ = jax.lax.scan(lambda c, _: (c + x * 1e-30, None),
                                  jnp.float32(0.0), None, length=STEPS)
            return out
        x = jnp.float32(1.0)
        jax.block_until_ready(empty(x))
        ss = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(empty(x))
            ss.append((time.perf_counter() - t0) * 1e3)
        _OVH = min(ss)
        print(f"[cal] {_OVH:.2f} ms/dispatch", flush=True)
    return _OVH

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
        def body(carry, _):
            eps = jnp.asarray(carry * 1e-30, a[0].dtype)
            return jnp.float32(step(*((a[0] + eps,) + a[1:]))), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
        return out
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(*args); jax.block_until_ready(out)
    dt = ((time.perf_counter() - t0) * 1e3 - overhead()) / STEPS
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt

for chunk in (128, 256, 512):
    cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                           blend_chunk=chunk, pair_capacity_per_gaussian=9,
                           row_capacity_per_gaussian=3, use_pallas=True)
    gx, gy = cfg.grid
    op = sc["opacity"]
    prep = jax.jit(lambda m, c, o: prep_mod.preprocess(
        m, c, cam, W, H, opacity=o))(sc["means3d"], sc["cov6"], op)
    n = N
    p_cap = cfg.pair_capacity(n)
    tiles = jax.jit(lambda p: binning.build_tile_lists(
        p, gx, gy, cfg.max_per_tile, expand_capacity=cfg.expand_capacity(n),
        pair_capacity=p_cap, chunk=chunk, opacity=op,
        row_capacity=cfg.row_capacity(n)))(prep)
    feat = jax.jit(lambda pr: tile_blend.pack_features(
        pr.mean2d, pr.conic, op.reshape(-1), sc["rgb"], pr.valid))(prep)
    m = tiles.sorted_gid.shape[0]
    pad_len = 2 * chunk + (-m) % chunk
    gid_pad = jnp.concatenate([tiles.sorted_gid, jnp.full((pad_len,), n, jnp.int32)])
    tile_pad = jnp.concatenate([tiles.sorted_tile,
                                jnp.full((pad_len,), cfg.num_tiles, jnp.int32)])
    live_pad = jnp.concatenate([tiles.in_count, jnp.zeros((pad_len,), bool)])
    feat_sorted = jax.jit(lambda f, g: f[g])(feat, gid_pad)
    print(f"--- chunk={chunk} p_cap={p_cap} blocks={p_cap // chunk} "
          f"ovf={int(tiles.pair_overflow)}", flush=True)
    blend = lambda fs: tile_blend.blend_sorted_features(
        fs, tile_pad, live_pad, tiles.block_tile, tiles.aligned_starts,
        tiles.starts, tiles.counts, tiles.sorted_shift, gx,
        cfg.num_tiles, p_cap, chunk)
    f = timed(f"blend fwd c{chunk}", lambda fs: blend(fs)[0], feat_sorted)
    fb = timed(f"blend fwd+bwd c{chunk}",
               lambda fs: jnp.sum(blend(fs)[0] ** 2), feat_sorted, grad_wrt=0)
    # sanity: color checksum
    col = jax.jit(lambda fs: blend(fs)[0])(feat_sorted)
    print(f"    colsum={float(jnp.sum(col)):.3f}", flush=True)
print("DONE", flush=True)
