import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PB = 13456
CHUNK = 128
FEAT = 16
PIX = 256
key = jax.random.PRNGKey(0)
pairT = jax.random.normal(key, (FEAT, PB*CHUNK), jnp.float32)
btile = jnp.arange(PB+1, dtype=jnp.int32) // 2

STEPS = 10
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a); a2[0] = a2[0] + c*1e-30
            r = fn(*a2)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(r))
            return s*1e-30, None
        c,_ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0=time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

def make(variant):
    def kernel(btile_ref, pair_ref, out_ref, carry):
        b = pl.program_id(0)
        out_ref[...] = jnp.zeros_like(out_ref)
        if variant == "empty":
            return
        t = btile_ref[b]
        if variant == "copyrow":
            out_ref[0, 0, :] = (jnp.sum(pair_ref[...], axis=1)[None, :] @ jnp.ones((FEAT, PIX), jnp.float32))[0]
            return
        feat = pair_ref[...]
        x = feat[0][None,:]; y = feat[1][None,:]
        px = jax.lax.broadcasted_iota(jnp.int32,(PIX,1),0).astype(jnp.float32)
        dx = x - px; dy = y - px
        if variant == "alpha":
            power = -0.5*(feat[2][None,:]*dx*dx + feat[4][None,:]*dy*dy) - feat[3][None,:]*dx*dy
            e = jnp.exp(power)
            out_ref[0,0,:] = jnp.sum(e, axis=1)
            return
        if variant == "when":
            s_in = carry[0,:]
            @pl.when(jnp.max(s_in) >= 1e-4)
            def _w():
                power = -0.5*(feat[2][None,:]*dx*dx + feat[4][None,:]*dy*dy) - feat[3][None,:]*dx*dy
                e = jnp.exp(power)
                out_ref[0,0,:] = jnp.sum(e, axis=1)
                carry[0,:] = e[:, CHUNK-1]
            return
    return kernel

for variant in ["alpha", "when"]:
    kernel = make(variant)
    def f(pairT, kernel=kernel):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(PB,),
            in_specs=[pl.BlockSpec((FEAT, CHUNK), lambda b,*s: (0,b))],
            out_specs=pl.BlockSpec((1,8,PIX), lambda b,*s: (b,0,0)),
            scratch_shapes=[pltpu.VMEM((8,PIX), jnp.float32)])
        return pl.pallas_call(kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((PB,8,PIX), jnp.float32))(btile, pairT)
    timeit(variant, f, pairT)
