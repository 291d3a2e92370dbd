"""Validate: bulk (64,16) slice-gather of 18K granules ~ memcpy speed?"""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

m_pad = 901376
pb2 = 18144   # p_cap / 64
half = 64
FEAT = 16
rng = np.random.default_rng(0)
feat = jnp.asarray(rng.normal(size=(m_pad, FEAT)).astype(np.float32))
featT = jnp.asarray(rng.normal(size=(FEAT, m_pad)).astype(np.float32))
src = jnp.asarray(np.sort(rng.integers(0, m_pad - 2*half, pb2)).astype(np.int32))

def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            eps = (c * 1e-30).astype(a[0].dtype)
            out = fn(a[0] + eps, *a[1:])
            return c + jnp.float32(1e-30) * jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return out
    r = loop(*args); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = loop(*args); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:40s} {dt:7.2f} ms", flush=True)

# A: granule slice-gather rows (pb2, 64, 16)
def ga(feat, src):
    return jax.vmap(lambda s: jax.lax.dynamic_slice(feat, (s, 0), (half, FEAT)))(src)
timed("granule slice-gather (18K x 64x16)", ga, feat, src)

# B: transposed: (pb2, 16, 64) from (16, m_pad)
def gb(featT, src):
    return jax.vmap(lambda s: jax.lax.dynamic_slice(featT, (0, s), (FEAT, half)))(src)
timed("granule slice-gather T (18K x 16x64)", gb, featT, src)

# C: plain row gather for comparison (1.16M rows)
idx = jnp.asarray(rng.integers(0, m_pad, pb2 * half).astype(np.int32))
def gc(feat, idx):
    return feat[idx]
timed("row gather (1.16M x 16)", gc, feat, idx)

# D: granule scatter-add back (pb2, 64, 16) -> (m_pad, 16)
upd = jnp.asarray(rng.normal(size=(pb2, half, FEAT)).astype(np.float32))
import functools
def gd(upd, src):
    zero = jnp.zeros((m_pad, FEAT))
    def body(acc, i):
        return acc, None
    # scatter-add with update windows via jax.lax.scatter_add
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    return jax.lax.scatter_add(zero, src[:, None], upd, dnums)
timed("granule scatter-add (18K x 64x16)", gd, upd, src)

# E: g8 row gather: (18K, 8, 256) from (8161, 8, 256)
g8 = jnp.asarray(rng.normal(size=(8161, 8, 256)).astype(np.float32))
bt = jnp.asarray(rng.integers(0, 8160, pb2).astype(np.int32))
def ge(g8, bt):
    return g8[bt]
timed("g8 gather (18K x 8x256)", ge, g8, bt)
