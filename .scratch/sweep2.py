import sys, time
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

def bench_cfg(cfg, steps=10):
    def fwd_bwd(means, cov6, op, rgb):
        def f(means, cov6, op, rgb):
            out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
            return jnp.sum(out.color*out.color), out.num_rendered
        (loss,nrend),grads = jax.value_and_grad(f,argnums=(0,1,2,3),has_aux=True)(means,cov6,op,rgb)
        return loss,nrend,grads
    @jax.jit
    def loop(means,cov6,op,rgb):
        def body(carry,_):
            loss,nrend,grads = fwd_bwd(means+carry*1e-30,cov6,op,rgb)
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
            return loss+gsum*1e-30, nrend
        return jax.lax.scan(body,0.0,None,length=steps)
    out = loop(*args); jax.block_until_ready(out)
    t0=time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    dt=(time.perf_counter()-t0)/steps
    return dt*1e3, int(out[1][0])

import traceback
for chunk, pcg, rcg in [(64,10,4),(128,9,3.2),(128,12,4),(96,10,4)]:
    try:
        cfg = RasterizerConfig(width=W,height=H,max_per_tile=1024,blend_chunk=chunk,
                               pair_capacity_per_gaussian=pcg, row_capacity_per_gaussian=rcg)
        ms, nr = bench_cfg(cfg)
        print(f"chunk={chunk} pcg={pcg} rcg={rcg}: {ms:.1f} ms  nrend={nr}", flush=True)
    except Exception as e:
        traceback.print_exc()
        print(f"chunk={chunk} pcg={pcg} rcg={rcg}: FAILED {type(e).__name__}", flush=True)
