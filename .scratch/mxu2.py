"""Microbench: MXU offload candidates for the blend kernels.

Each variant runs the same flat grid (PB blocks of (FEAT, CHUNK)) and
writes (1, 8, PIX) per block so DMA traffic is comparable; only the math
inside differs. Times isolate: the lane cumprod scan, the lane cumsum,
the backward's 9 sublane reductions, and their MXU replacements.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
PB, CHUNK, FEAT, PIX, TILE = 13456, 128, 16, 256, 16
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
    print(f"{name:36s} {dt:8.2f} ms  ({dt/PB*1e3:5.2f} us/blk)", flush=True)

def mm(a, b):
    return jax.lax.dot_general(a, b, ((((1,), (0,))), ((), ())),
                               preferred_element_type=jnp.float32)

def hs_cumprod(x):
    k = x.shape[1]; d = 1
    while d < k:
        x = x * jnp.concatenate([jnp.ones_like(x[:, :d]), x[:, :k-d]], axis=1)
        d *= 2
    return x

def hs_cumsum(x):
    k = x.shape[1]; d = 1
    while d < k:
        x = x + jnp.concatenate([jnp.zeros_like(x[:, :d]), x[:, :k-d]], axis=1)
        d *= 2
    return x

def tri_incl():
    li = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (li <= lj).astype(jnp.float32)

def make(variant):
    def kernel(btile_ref, pair_ref, out_ref, carry):
        t = btile_ref[pl.program_id(0)]
        out_ref[...] = jnp.zeros_like(out_ref)
        feat = pair_ref[...]
        # common: produce a plausible om in (0,1]
        op = feat[5][None, :] * 0.9
        om = 1.0 - op * feat[6][None, :] * jnp.ones((PIX, 1), jnp.float32)
        if variant == "scan_hs":
            s = hs_cumprod(om)
            out_ref[0, 0, :] = s[:, CHUNK-1]
        elif variant == "scan_mxu_log":
            s = jnp.exp(mm(jnp.log(om), tri_incl()))
            out_ref[0, 0, :] = s[:, CHUNK-1]
        elif variant == "cumsum_hs":
            s = hs_cumsum(om)
            out_ref[0, 0, :] = s[:, CHUNK-1]
        elif variant == "cumsum_mxu":
            s = mm(om, tri_incl())
            out_ref[0, 0, :] = s[:, CHUNK-1]
        elif variant == "reduce9_sub":
            dpow = om; dx = om * 1.1; dy = om * 0.9
            w = om * 0.5
            rows = [
                jnp.sum(dpow * (-(feat[2][None,:]*dx + feat[3][None,:]*dy)), axis=0),
                jnp.sum(dpow * (-(feat[4][None,:]*dy + feat[3][None,:]*dx)), axis=0),
                jnp.sum(dpow * (-0.5*dx*dx), axis=0),
                jnp.sum(dpow * (-dx*dy), axis=0),
                jnp.sum(dpow * (-0.5*dy*dy), axis=0),
                jnp.sum(dpow, axis=0),
                jnp.sum(w, axis=0), jnp.sum(w*1.1, axis=0), jnp.sum(w*0.9, axis=0),
            ]
            out_ref[0, 0, :] = jnp.concatenate(
                [jnp.stack(rows), jnp.zeros((7, CHUNK), jnp.float32)]
            ).reshape(-1)[:PIX]
        elif variant == "reduce_mxu":
            # moments: P (PIX, 8) monomials; dpow (PIX, CHUNK); w (PIX, CHUNK)
            p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
            px = (p % TILE).astype(jnp.float32); py = (p // TILE).astype(jnp.float32)
            one = jnp.ones_like(px)
            P = jnp.concatenate([one, px, py, px*px, px*py, py*py,
                                 one, one], axis=1)          # (PIX, 8)
            dpow = om
            w = om * 0.5
            g = jnp.concatenate([one*0.3, one*0.5, one*0.7,
                                 jnp.zeros((PIX, 5), jnp.float32)], axis=1)
            m1 = jax.lax.dot_general(P, dpow, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (8, CHUNK)
            m2 = jax.lax.dot_general(g, w, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (8, CHUNK)
            out_ref[0, 0, :] = jnp.concatenate([m1[:4], m2[:4]]).reshape(-1)[:PIX]
        elif variant == "dldw_elem":
            dldw = (0.3 * feat[6][None,:] * jnp.ones((PIX,1), jnp.float32)
                    + 0.5 * feat[7][None,:] + 0.7 * feat[8][None,:])
            out_ref[0, 0, :] = jnp.sum(dldw, axis=1)
        elif variant == "dldw_mxu":
            p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0).astype(jnp.float32)
            g3 = jnp.concatenate([p*0.3, p*0.5, p*0.7,
                                  jnp.zeros((PIX, 5), jnp.float32)], axis=1)
            rgb8 = jnp.concatenate([feat[6:9], jnp.zeros((5, CHUNK), jnp.float32)])
            dldw = mm(g3, rgb8)
            out_ref[0, 0, :] = jnp.sum(dldw, axis=1)
    return kernel

for variant in ["scan_hs", "scan_mxu_log", "cumsum_hs", "cumsum_mxu",
                "reduce9_sub", "reduce_mxu", "dldw_elem", "dldw_mxu"]:
    kernel = make(variant)
    def f(pairT, kernel=kernel):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(PB,),
            in_specs=[pl.BlockSpec((FEAT, CHUNK), lambda b,*s: (0,b))],
            out_specs=pl.BlockSpec((1,8,PIX), lambda b,*s: (b % 8192,0,0)),
            scratch_shapes=[pltpu.VMEM((8,PIX), jnp.float32)])
        return pl.pallas_call(kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8192,8,PIX), jnp.float32))(btile, pairT)
    try:
        timeit(variant, f, pairT)
    except Exception as e:
        print(variant, "FAILED:", str(e)[:300], flush=True)

# precision: log-exp cumprod vs hs cumprod on realistic alphas
import numpy as np
rng = np.random.default_rng(0)
alpha = np.clip(rng.uniform(0, 0.12, (4096, 128)).astype(np.float32), 0, 0.99)
om = 1.0 - alpha
hs = np.asarray(hs_cumprod(jnp.asarray(om)))
li = np.tril(np.ones((128, 128), np.float32)).T
lg = np.exp(np.asarray(jnp.log(jnp.asarray(om))) @ li)
print("cumprod log-exp max abs diff:", np.abs(hs - lg).max(),
      "max rel:", (np.abs(hs - lg) / np.maximum(hs, 1e-6)).max(), flush=True)
