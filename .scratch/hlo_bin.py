import sys, re
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
txt = f.lower(prep, op).compile().as_text()
open("/tmp/bin_hlo.txt", "w").write(txt)

# print each top-level fusion with its root + metadata source lines
for name in ["fusion.9", "fusion.11", "fusion.104", "fusion.105", "while.13",
             "while.14", "sort.10", "reduce-window.10", "fusion.10",
             "fusion.4", "fusion.7", "fusion.8", "concatenate.10", "slice.158"]:
    m = re.search(rf'%?{re.escape(name)} = ([^\n]+)', txt)
    if m:
        line = m.group(1)
        meta = re.search(r'metadata=\{[^}]*op_name="([^"]+)"', line)
        kind = line.split(" ")[1] if " " in line else line
        print(f"== {name}: {line[:100]}")
        if meta:
            print(f"    op_name: {meta.group(1)[:160]}")
        sl = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
        if sl:
            print(f"    src: {sl.group(1)}:{sl.group(2)}")
