"""FULL binning with optimization_barrier after wide gathers."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod
from scenes import look_at_camera, random_gaussians

W, H, N = 1920, 1080, 100_000
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3)
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = cfg.grid
m = cfg.expand_capacity(N); m1 = cfg.row_capacity(N); p_cap = cfg.pair_capacity(N)
prep = jax.jit(lambda ms, c: prep_mod.preprocess(ms, c, cam, W, H,
                                                 opacity=sc["opacity"]))(
    sc["means3d"], sc["cov6"])
prep = jax.tree.map(jax.lax.stop_gradient, prep)
op_flat = sc["opacity"].reshape(-1)

STEPS = 20
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
    print(f"{name:44s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

# monkeypatch: barrier after wide gathers
orig = binning.build_tile_lists
import gaussianmesh_tpu.ops.binning as B

def patched(prep, gx_, gy_, max_per_tile, expand_capacity, pair_capacity,
            chunk=128, opacity=None, row_capacity=None):
    # copy of build_tile_lists with barriers (quick hack: wrap gather via
    # patching jnp? simpler: inline barrier by subclassing)  -- instead we
    # just patch _segment_const? No: easiest is to copy the code path with
    # barriers. To avoid drift, monkeypatch jnp take? Overkill: test by
    # wrapping the two gathers through a barrier-enabled take function.
    raise SystemExit

# simplest honest test: patch binning source in-memory via exec with barriers
import inspect, re
src = inspect.getsource(B)
src = src.replace("gtab_o = gtab[order]",
                  "gtab_o = jax.lax.optimization_barrier(gtab[order])")
src = src.replace("row_tab = tab1[rank1]",
                  "row_tab = jax.lax.optimization_barrier(tab1[rank1])")
src = src.replace("slot_vals = _segment_const(vals, jnp.minimum(toff[:m1], m), m)  # (m, 3)",
                  "slot_vals = jax.lax.optimization_barrier(_segment_const(vals, jnp.minimum(toff[:m1], m), m))")
ns = {}
exec(compile(src, "binning_patched", "exec"), ns)
build_patched = ns["build_tile_lists"]

def f_full(prep):
    return B.build_tile_lists(prep, gx, gy, cfg.max_per_tile,
                              expand_capacity=m, pair_capacity=p_cap,
                              chunk=128, opacity=op_flat, row_capacity=m1)
def f_patched(prep):
    return build_patched(prep, gx, gy, cfg.max_per_tile,
                         expand_capacity=m, pair_capacity=p_cap,
                         chunk=128, opacity=op_flat, row_capacity=m1)
timeit("FULL (current)", f_full, prep)
timeit("FULL (barriers)", f_patched, prep)
