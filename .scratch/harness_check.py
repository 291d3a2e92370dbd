import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
rng = np.random.default_rng(0)
m_pad = 901376
feat = jnp.asarray(rng.normal(size=(m_pad, 16)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, m_pad, 1161216).astype(np.int32))

@jax.jit
def loop(feat, idx):
    def body(c, _):
        eps = (c * 1e-30).astype(feat.dtype)
        out = feat[idx] + eps
        return c + jnp.float32(1e-30) * jnp.sum(out), None
    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
    return out

r = loop(feat, idx); jax.block_until_ready(r)
for _ in range(3):
    t0 = time.perf_counter(); r = loop(feat, idx); jax.block_until_ready(r)
    print("per step ms:", (time.perf_counter() - t0) / 10 * 1e3, flush=True)

# also: empty dispatch cost (relay RTT estimate)
@jax.jit
def nothing(x):
    return x + 1.0
s = jnp.float32(0.0)
r = nothing(s); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(10):
    r = nothing(r)
jax.block_until_ready(r)
print("empty dispatch ms (x10 pipelined):", (time.perf_counter()-t0)/10*1e3)
t0 = time.perf_counter()
for _ in range(10):
    r = nothing(r); jax.block_until_ready(r)
print("empty dispatch ms (x10 sync):", (time.perf_counter()-t0)/10*1e3)
