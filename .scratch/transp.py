"""Cost of (1,256)->(256,1) lane->sublane transposes inside a kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
PB, CHUNK, FEAT, PIX = 13456, 128, 16, 256
key = jax.random.PRNGKey(0)
pairT = jax.random.uniform(key, (FEAT, PB*CHUNK), jnp.float32)
btile = jnp.arange(PB+1, dtype=jnp.int32) // 2
STEPS = 10
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a); a2[0] = a2[0] + c*1e-30
            r = fn(*a2)
            return sum(jnp.sum(l) for l in jax.tree.leaves(r))*1e-30, None
        c,_ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0=time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/STEPS*1e3
    print(f"{name:40s} {dt:8.2f} ms ({dt/PB*1e3:5.2f} us/blk)", flush=True)

def make(n_transp, col_carry):
    def kernel(btile_ref, pair_ref, out_ref, carry, carry2):
        out_ref[...] = jnp.zeros_like(out_ref)
        feat = pair_ref[...]
        if col_carry:
            acc = carry2[:, 0:1]                  # (PIX,1) native column
        else:
            acc = carry[0, :][:, None]            # (1,PIX) -> (PIX,1)
        x = feat[0][None, :] * jnp.ones((PIX, 1), jnp.float32)
        for i in range(n_transp):
            if col_carry:
                acc = acc + x[:, i:i+1]
            else:
                acc = acc + carry[min(i, 7), :][:, None]
        y = jnp.sum(x * acc, axis=1)              # (PIX,) sublanes
        if col_carry:
            carry2[:, 0] = y
        else:
            carry[0, :] = y                       # sublane -> lane store
    return kernel

for name, n, col in [("0 transposes, col carry", 0, True),
                     ("1 transpose (row carry)", 0, False),
                     ("4 transposes (row carry)", 3, False),
                     ("8 transposes (row carry)", 7, False)]:
    kernel = make(n, col)
    def f(pairT, kernel=kernel):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(PB,),
            in_specs=[pl.BlockSpec((FEAT, CHUNK), lambda b,*s: (0,b))],
            out_specs=pl.BlockSpec((1,8,PIX), lambda b,*s: (b % 8192,0,0)),
            scratch_shapes=[pltpu.VMEM((8,PIX), jnp.float32),
                            pltpu.VMEM((PIX,8), jnp.float32)])
        return pl.pallas_call(kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8192,8,PIX), jnp.float32))(btile, pairT)
    try:
        timeit(name, f, pairT)
    except Exception as e:
        print(name, "FAILED:", str(e)[:200], flush=True)
