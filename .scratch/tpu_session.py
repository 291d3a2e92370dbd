"""One TPU claim, all pending measurements: verify, bench, edit fps,
roll-scan variant microbench."""
import sys, time, json
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("devices:", jax.devices(), flush=True)

# ---- 1. verify drive (public API render + grad, pallas vs jnp) ----
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from scenes import look_at_camera, random_gaussians
W = H = 256
cam = look_at_camera(W, H); sc = random_gaussians(5000, seed=42)
cfg = RasterizerConfig(width=W, height=H)
cfgj = RasterizerConfig(width=W, height=H, use_pallas=False)
out = rasterize(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"], jnp.ones(3), cam, cfg)
outj = rasterize(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"], jnp.ones(3), cam, cfgj)
print("verify color diff:", float(jnp.abs(out.color - outj.color).max()),
      "nrend:", int(out.num_rendered), int(outj.num_rendered), flush=True)
g = jax.grad(lambda o: rasterize(sc["means3d"], sc["cov6"], o, sc["rgb"], jnp.ones(3), cam, cfg).color.sum())(sc["opacity"])
gj = jax.grad(lambda o: rasterize(sc["means3d"], sc["cov6"], o, sc["rgb"], jnp.ones(3), cam, cfgj).color.sum())(sc["opacity"])
print("verify grad diff:", float(jnp.abs(g - gj).max()),
      "max:", float(jnp.abs(gj).max()), flush=True)

# ---- 2. bench (same as bench.py) ----
import subprocess
WB, HB, NB = 1920, 1080, 100_000
cfgb = RasterizerConfig(width=WB, height=HB, max_per_tile=1024, blend_chunk=128,
                        pair_capacity_per_gaussian=9, row_capacity_per_gaussian=3)
camb = look_at_camera(WB, HB, distance=4.0)
scb = random_gaussians(NB, seed=0, spread=1.4, scale_range=(0.004, 0.02))
bg = jnp.ones(3)
def fwd_bwd(means, cov6, op, rgb):
    def f(means, cov6, op, rgb):
        o = rasterize(means, cov6, op, rgb, bg, camb, cfgb)
        return jnp.sum(o.color * o.color), o.num_rendered
    (l, nr), gr = jax.value_and_grad(f, argnums=(0,1,2,3), has_aux=True)(means, cov6, op, rgb)
    return l, nr, gr
@jax.jit
def loop(means, cov6, op, rgb):
    def body(c, _):
        l, nr, gr = fwd_bwd(means + c * 1e-30, cov6, op, rgb)
        gs = sum(jnp.sum(x) for x in jax.tree.leaves(gr))
        return l + gs * 1e-30, nr
    return jax.lax.scan(body, 0.0, None, length=10)
args = (scb["means3d"], scb["cov6"], scb["opacity"], scb["rgb"])
o = loop(*args); jax.block_until_ready(o)
t0 = time.perf_counter(); o = loop(*args); jax.block_until_ready(o)
dt = (time.perf_counter() - t0) / 10
print(f"bench: {dt*1e3:.2f} ms/step ({WB*HB/dt/1e6:.2f} Mpix/s), nrend={int(o[1][0])}", flush=True)

# ---- 3. edit playback fps ----
from gaussianmesh_tpu.edit.runtime import SceneEditor, make_playback_fn
from tests.meshes import icosphere
editor = SceneEditor()
obj = editor.add_object("/tmp/gm_tpu_run/assets/obj.ply", "/tmp/gm_tpu_run/assets/mesh.obj", name="obj")
came = look_at_camera(WB, HB, distance=3.2)
v, f = icosphere(5)
frames = jnp.asarray(np.stack([v * (1.0 + 0.15*np.sin(i/16*2*np.pi)) for i in range(16)]).astype(np.float32))
cfge = RasterizerConfig(width=WB, height=HB, max_per_tile=1024, blend_chunk=128,
                        pair_capacity_per_gaussian=8, row_capacity_per_gaussian=3)
frame_fn = make_playback_fn(obj, came, cfge)
@jax.jit
def seq_sum(frames):
    def body(c, vfr):
        img = frame_fn(vfr + c * 1e-30)
        return img.mean() * 1e-20, None
    out, _ = jax.lax.scan(body, 0.0, frames)
    return out
val = float(seq_sum(frames))
t0 = time.perf_counter(); val = float(seq_sum(frames))
dt = (time.perf_counter() - t0 - 0.03) / frames.shape[0]
print(f"edit: {dt*1e3:.1f} ms/frame -> {1/dt:.1f} fps", flush=True)

# ---- 4. roll-based scan variant microbench ----
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
PB, CHUNK, FEAT, PIX = 13456, 128, 16, 256
key = jax.random.PRNGKey(0)
pairT = jax.random.uniform(key, (FEAT, PB*CHUNK), jnp.float32)
btile = jnp.arange(PB+1, dtype=jnp.int32) // 2
def hs_concat(x):
    k = x.shape[1]; d = 1
    while d < k:
        x = x * jnp.concatenate([jnp.ones_like(x[:, :d]), x[:, :k-d]], axis=1)
        d *= 2
    return x
def hs_roll(x):
    k = x.shape[1]; d = 1
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    while d < k:
        rolled = pltpu.roll(x, d, axis=1)
        x = x * jnp.where(lane < d, 1.0, rolled)
        d *= 2
    return x
def make(which):
    def kernel(btile_ref, pair_ref, out_ref, carry):
        feat = pair_ref[...]
        om = 1.0 - feat[5][None, :] * jnp.ones((PIX, 1), jnp.float32) * 0.5
        s = (hs_concat if which == "concat" else hs_roll)(om)
        out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[0, 0, :] = s[:, CHUNK-1]
    return kernel
for which in ("concat", "roll"):
    kernel = make(which)
    def fv(pairT, kernel=kernel):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(PB,),
            in_specs=[pl.BlockSpec((FEAT, CHUNK), lambda b,*s: (0,b))],
            out_specs=pl.BlockSpec((1,8,PIX), lambda b,*s: (b % 8192,0,0)),
            scratch_shapes=[pltpu.VMEM((8,PIX), jnp.float32)])
        return pl.pallas_call(kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8192,8,PIX), jnp.float32))(btile, pairT)
    try:
        @jax.jit
        def lp(x, fv=fv):
            def body(c, _):
                r = fv(x + c*1e-30)
                return jnp.sum(r)*1e-30, None
            return jax.lax.scan(body, 0.0, None, length=10)[0]
        r = lp(pairT); jax.block_until_ready(r)
        t0 = time.perf_counter(); r = lp(pairT); jax.block_until_ready(r)
        print(f"scan {which}: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(which, "FAILED:", str(e)[:150], flush=True)
print("SESSION DONE", flush=True)
