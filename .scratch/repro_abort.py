"""Reproduce the scan>=2 TPU abort at bench scale."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from scenes import look_at_camera, random_gaussians

WIDTH, HEIGHT = 1920, 1080
N = 100_000
cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3, use_pallas=True)
cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
bg = jnp.ones(3)

def fwd_bwd(means, cov6, op, rgb):
    def f(means, cov6, op, rgb):
        out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
        return jnp.sum(out.color * out.color), out.num_rendered
    (loss, nrend), grads = jax.value_and_grad(
        f, argnums=(0, 1, 2, 3), has_aux=True)(means, cov6, op, rgb)
    return loss, nrend, grads

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2

@jax.jit
def loop(means, cov6, op, rgb):
    def body(carry, _):
        loss, nrend, grads = fwd_bwd(means + carry * 1e-30, cov6, op, rgb)
        gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return loss + gsum * 1e-30, nrend
    loss, nrends = jax.lax.scan(body, 0.0, None, length=steps)
    return loss, nrends

args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"])
print(f"steps={steps}: compiling+running...", flush=True)
out = loop(*args)
jax.block_until_ready(out)
print(f"steps={steps}: OK loss={float(out[0]):.4g} nrend={out[1]}", flush=True)
t0 = time.perf_counter()
out = loop(*args)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / steps
print(f"step_ms={dt*1e3:.2f}  mpix/s={(WIDTH*HEIGHT)/dt/1e6:.1f}", flush=True)
