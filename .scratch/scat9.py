import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
M, N, F = 1_048_576, 100_001, 16
key = jax.random.PRNGKey(0)
gid = jax.random.randint(key, (M,), 0, N, jnp.int32)
d = jax.random.normal(jax.random.PRNGKey(1), (M, F), jnp.float32)
v = jax.random.normal(jax.random.PRNGKey(2), (N, F), jnp.float32)
STEPS = 10
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a); a2[1] = a2[1] + c * 1e-30
            r = fn(*a2)
            # defeat DCE: project result against persistent random matrix
            return jnp.vdot(r, v[:, :r.shape[1]]) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

def s16(gid, d):
    return jnp.zeros((N, F), jnp.float32).at[gid].add(d)
def s9(gid, d):
    return jnp.zeros((N, 9), jnp.float32).at[gid].add(d[:, :9])
def s8(gid, d):
    return jnp.zeros((N, 8), jnp.float32).at[gid].add(d[:, :8])
timeit("scatter-add 16 cols", s16, gid, d)
timeit("scatter-add 9 cols", s9, gid, d)
timeit("scatter-add 8 cols", s8, gid, d)
