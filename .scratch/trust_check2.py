import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
mm = jax.jit(lambda a: jnp.float32(jnp.sum(a @ a) * 1e-30))
float(mm(a))
for _ in range(3):
    t0 = time.perf_counter(); v = float(mm(a))
    print("matmul 4096^3 fetch-synced:", (time.perf_counter()-t0)*1e3, "ms", flush=True)
mm10 = jax.jit(lambda a: jnp.float32(jnp.sum(
    jax.lax.scan(lambda c, _: (c @ a, None), a, None, length=10)[0]) * 1e-30))
float(mm10(a))
for _ in range(2):
    t0 = time.perf_counter(); v = float(mm10(a))
    print("10x matmul fetch-synced:", (time.perf_counter()-t0)*1e3, "ms", flush=True)
# now the real ops, fetch-synced, amortized over 10 in-scan iters with
# index perturbation
m_pad = 901376; pb2 = 18144; half = 64; FEAT = 16
feat = jnp.asarray(rng.normal(size=(m_pad, FEAT)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, m_pad, pb2 * half).astype(np.int32))
src = jnp.asarray(np.sort(rng.integers(0, m_pad - 2*half, pb2)).astype(np.int32))
upd = jnp.asarray(rng.normal(size=(pb2, half, FEAT)).astype(np.float32))
g8 = jnp.asarray(rng.normal(size=(8161, 8, 256)).astype(np.float32))
bt = jnp.asarray(rng.integers(0, 8160, pb2).astype(np.int32))

def timed(name, fn, ints, *args):
    @jax.jit
    def loop(ints, *a):
        def body(c, _):
            z = (c * 1e-30).astype(jnp.int32)
            out = fn(ints + z, *a)
            return c + jnp.float32(1e-30) * jnp.sum(out), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return out
    float(loop(ints, *args))
    t0 = time.perf_counter(); float(loop(ints, *args))
    print(f"{name:42s} {(time.perf_counter()-t0)/10*1e3:7.3f} ms", flush=True)

timed("row gather (1.16M x 16)", lambda i, f: f[i], idx, feat)
timed("granule slice-gather (18K x 64x16)",
      lambda s, f: jax.vmap(lambda si: jax.lax.dynamic_slice(f, (si, 0), (half, FEAT)))(s),
      src, feat)
dnums = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1, 2), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,))
timed("granule scatter-add (18K x 64x16)",
      lambda s, u: jax.lax.scatter_add(jnp.zeros((m_pad, FEAT)), s[:, None], u, dnums),
      src, upd)
timed("g8 gather (18K x 8x256)", lambda b, g: g[b], bt, g8)
timed("cumsum 900Kx2", lambda i, f: jnp.cumsum(f + i[0], axis=0), idx[:1],
      feat[:900000, :2])
timed("1-col scatter-max (300K -> 900K)",
      lambda s, v: jnp.full((900000,), -1, jnp.int32).at[s].max(v, mode="drop"),
      jnp.asarray(rng.integers(0, 900000, 300000).astype(np.int32)),
      jnp.asarray(rng.integers(0, 100000, 300000).astype(np.int32)))
timed("cummax 900K", lambda i, v: jax.lax.cummax(v + i[0]), idx[:1],
      jnp.asarray(rng.integers(0, 100000, 900000).astype(np.int32)))
timed("sort (900K, 2key x 3ops)",
      lambda i, d, g: jax.lax.sort((i, d, g), num_keys=2, is_stable=True),
      jnp.asarray(rng.integers(0, 8160, 900000).astype(np.int32)),
      jnp.asarray(rng.normal(size=900000).astype(np.float32)),
      jnp.asarray(rng.integers(0, 100000, 900000).astype(np.int32)))
