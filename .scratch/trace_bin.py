import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from gaussianmesh_tpu.ops import preprocess as prep_mod, binning
from scenes import look_at_camera, random_gaussians

W, H, N = 1920, 1080, 100_000
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = prep_mod.tile_grid(W, H)
NT = gx * gy
CHUNK = 128
m_cap, r_cap = N * 9, N * 3
p_cap = -(-(N * 9 + NT * (CHUNK // 2)) // CHUNK) * CHUNK
op = sc["opacity"]

prep = jax.jit(lambda a, b, o: prep_mod.preprocess(a, b, cam, W, H, opacity=o))(
    sc["means3d"], sc["cov6"], op)
prep = jax.tree.map(jax.lax.stop_gradient, prep)

f = jax.jit(lambda prep, op: binning.build_tile_lists(
    prep, gx, gy, 1024, expand_capacity=m_cap, pair_capacity=p_cap,
    chunk=CHUNK, opacity=op, row_capacity=r_cap))
o = f(prep, op); jax.block_until_ready(o)

with jax.profiler.trace("/tmp/bin_trace"):
    for _ in range(5):
        o = f(prep, op)
    jax.block_until_ready(o)

# parse the chrome trace
files = glob.glob("/tmp/bin_trace/**/*.trace.json.gz", recursive=True)
files.sort(key=lambda p: -len(p))
ev_by_name = collections.Counter()
for fn in files[:1]:
    with gzip.open(fn, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            pid_name = ev.get("pid")
            ev_by_name[ev["name"]] += ev["dur"]
for name, dur in ev_by_name.most_common(40):
    print(f"{dur/5/1000:9.3f} ms  {name[:110]}")
