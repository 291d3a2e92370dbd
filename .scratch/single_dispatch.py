import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
rng = np.random.default_rng(0)
m_pad = 901376; pb2 = 18144; half = 64; FEAT = 16
feat = jnp.asarray(rng.normal(size=(m_pad, FEAT)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, m_pad, pb2 * half).astype(np.int32))
src = jnp.asarray(np.sort(rng.integers(0, m_pad - 2*half, pb2)).astype(np.int32))

gath = jax.jit(lambda i, f: f[i])
r = gath(idx, feat); jax.block_until_ready(r)
for _ in range(3):
    t0 = time.perf_counter(); r = gath(idx, feat); jax.block_until_ready(r)
    print("row gather single:", (time.perf_counter()-t0)*1e3, "ms", flush=True)

sl = jax.jit(lambda s, f: jax.vmap(
    lambda si: jax.lax.dynamic_slice(f, (si, 0), (half, FEAT)))(s))
r = sl(src, feat); jax.block_until_ready(r)
for _ in range(3):
    t0 = time.perf_counter(); r = sl(src, feat); jax.block_until_ready(r)
    print("granule slice-gather single:", (time.perf_counter()-t0)*1e3, "ms", flush=True)

cs = jax.jit(lambda f: jnp.cumsum(f, axis=0))
x = feat[:900000, :2]
r = cs(x); jax.block_until_ready(r)
for _ in range(3):
    t0 = time.perf_counter(); r = cs(x); jax.block_until_ready(r)
    print("cumsum 900Kx2 single:", (time.perf_counter()-t0)*1e3, "ms", flush=True)
