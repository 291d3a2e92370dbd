import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
PB, CHUNK, FEAT, PIX, TILE = 13456, 128, 16, 256, 16
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
            return sum(jnp.sum(l) for l in jax.tree.leaves(r))*1e-30, None
        c,_ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0=time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

def mm(a, b, contract):
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32)

def make(variant):
    def kernel(btile_ref, pair_ref, out_ref, carry):
        b = pl.program_id(0)
        t = btile_ref[b]
        out_ref[...] = jnp.zeros_like(out_ref)
        feat = pair_ref[...]
        if variant == "elem":
            p = jax.lax.broadcasted_iota(jnp.int32,(PIX,1),0)
            px = (t % 120 * TILE + p % TILE).astype(jnp.float32)
            py = (t // 120 * TILE + p // TILE).astype(jnp.float32)
            dx = feat[0][None,:] - px; dy = feat[1][None,:] - py
            power = -0.5*(feat[2][None,:]*dx*dx + feat[4][None,:]*dy*dy) - feat[3][None,:]*dx*dy
            raw = jnp.exp(power + feat[5][None,:])
            gate = (power <= 1e-6) & (raw >= 1/255.) & (feat[9][None,:] > 0)
            alpha = jnp.where(gate, jnp.minimum(raw, 0.99), 0.0)
            out_ref[0,0,:] = jnp.sum(alpha, axis=1)
        elif variant == "mxu":
            p = jax.lax.broadcasted_iota(jnp.int32,(PIX,1),0)
            px = (p % TILE).astype(jnp.float32); py = (p // TILE).astype(jnp.float32)
            one = jnp.ones_like(px); zero = jnp.zeros_like(px)
            mono = jnp.concatenate([one, px, py, px*px, py*py, px*py, zero, zero], axis=1)
            x = feat[0] - (t % 120 * TILE).astype(jnp.float32)
            y = feat[1] - (t // 120 * TILE).astype(jnp.float32)
            ca, cb, cc, logop = feat[2], feat[3], feat[4], feat[5]
            r0 = logop - (0.5*ca*x*x + 0.5*cc*y*y + cb*x*y)
            G = jnp.stack([r0, ca*x+cb*y, cc*y+cb*x, -0.5*ca, -0.5*cc, -cb, jnp.zeros_like(x), jnp.zeros_like(x)])
            p2 = mm(mono, G, (((1,),(0,))))
            raw = jnp.exp(p2)
            gate = (p2 <= feat[5][None,:] + 1e-6) & (raw >= 1/255.) & (feat[9][None,:] > 0)
            alpha = jnp.where(gate, jnp.minimum(raw, 0.99), 0.0)
            out_ref[0,0,:] = jnp.sum(alpha, axis=1)
        elif variant == "cumsum_hs":
            a = feat[0][None,:] * jax.lax.broadcasted_iota(jnp.float32,(PIX,CHUNK),0)
            k, d = CHUNK, 1
            while d < k:
                a = a + jnp.concatenate([jnp.zeros_like(a[:,:d]), a[:,:k-d]], axis=1)
                d *= 2
            out_ref[0,0,:] = jnp.sum(a, axis=1)
        elif variant == "cumsum_mxu":
            a = feat[0][None,:] * jax.lax.broadcasted_iota(jnp.float32,(PIX,CHUNK),0)
            li = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),0)
            lj = jax.lax.broadcasted_iota(jnp.int32,(CHUNK,CHUNK),1)
            tri = (li <= lj).astype(jnp.float32)
            a = mm(a, tri, (((1,),(0,))))
            out_ref[0,0,:] = jnp.sum(a, axis=1)
    return kernel

for variant in ["elem", "mxu", "cumsum_hs", "cumsum_mxu"]:
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
