import sys, time, os, traceback
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from scenes import look_at_camera, random_gaussians

W,H,N = 1920,1080,100_000
cam = look_at_camera(W,H,distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004,0.02))
bg = jnp.ones(3)
args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"])

def bench_cfg(cfg, steps=10, fwd_only=False):
    def fwd_bwd(means, cov6, op, rgb):
        def f(means, cov6, op, rgb):
            out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
            aux = (out.num_rendered, out.tile_overflow + out.rect_overflow + out.pair_overflow)
            return jnp.sum(out.color*out.color), aux
        if fwd_only:
            loss, aux = f(means, cov6, op, rgb)
            return loss, aux, ()
        (loss,aux),grads = jax.value_and_grad(f,argnums=(0,1,2,3),has_aux=True)(means,cov6,op,rgb)
        return loss,aux,grads
    @jax.jit
    def loop(means,cov6,op,rgb):
        def body(carry,_):
            loss,aux,grads = fwd_bwd(means+carry*1e-30,cov6,op,rgb)
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads)) if grads else 0.0
            return loss+gsum*1e-30, aux
        return jax.lax.scan(body,0.0,None,length=steps)
    out = loop(*args); jax.block_until_ready(out)
    t0=time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    dt=(time.perf_counter()-t0)/steps
    return dt*1e3, int(out[1][0][0]), int(out[1][1][0])

for chunk, pcg, rcg in [(128,9,3),(256,9,3),(512,9,3)]:
    for fwd_only in (False, True):
        try:
            cfg = RasterizerConfig(width=W,height=H,max_per_tile=1024,blend_chunk=chunk,
                                   pair_capacity_per_gaussian=pcg, row_capacity_per_gaussian=rcg)
            ms, nr, ovf = bench_cfg(cfg, fwd_only=fwd_only)
            tag = "fwd " if fwd_only else "f+b "
            print(f"{tag} chunk={chunk} pcg={pcg}: {ms:.1f} ms  nrend={nr} ovf={ovf}", flush=True)
        except Exception as e:
            traceback.print_exc()
            print(f"chunk={chunk} FAILED {type(e).__name__}", flush=True)
