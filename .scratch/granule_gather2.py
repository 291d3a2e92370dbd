"""Granule bulk-copy costs, with runtime-zero INT index perturbation."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
rng = np.random.default_rng(0)
m_pad = 901376; pb2 = 18144; half = 64; FEAT = 16
feat = jnp.asarray(rng.normal(size=(m_pad, FEAT)).astype(np.float32))
featT = jnp.asarray(rng.normal(size=(FEAT, m_pad)).astype(np.float32))
src = jnp.asarray(np.sort(rng.integers(0, m_pad - 2*half, pb2)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, m_pad, pb2 * half).astype(np.int32))
upd = jnp.asarray(rng.normal(size=(pb2, half, FEAT)).astype(np.float32))
g8 = jnp.asarray(rng.normal(size=(8161, 8, 256)).astype(np.float32))
bt = jnp.asarray(rng.integers(0, 8160, pb2).astype(np.int32))

def timed(name, fn, ints, *args):
    @jax.jit
    def loop(ints, *a):
        def body(c, _):
            z = (c * 1e-30).astype(jnp.int32)      # runtime zero
            out = fn(ints + z, *a)
            return c + jnp.float32(1e-30) * jnp.sum(out), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return out
    r = loop(ints, *args); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = loop(ints, *args); jax.block_until_ready(r)
    print(f"{name:42s} {(time.perf_counter()-t0)/10*1e3:7.2f} ms", flush=True)

timed("granule slice-gather (18K x 64x16)",
      lambda s, f: jax.vmap(lambda si: jax.lax.dynamic_slice(f, (si, 0), (half, FEAT)))(s),
      src, feat)
timed("granule slice-gather T (18K x 16x64)",
      lambda s, f: jax.vmap(lambda si: jax.lax.dynamic_slice(f, (0, si), (FEAT, half)))(s),
      src, featT)
timed("row gather (1.16M x 16)", lambda i, f: f[i], idx, feat)
dnums = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1, 2), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,))
timed("granule scatter-add (18K x 64x16)",
      lambda s, u: jax.lax.scatter_add(jnp.zeros((m_pad, FEAT)), s[:, None], u, dnums),
      src, upd)
timed("g8 gather (18K x 8x256)", lambda b, g: g[b], bt, g8)
timed("m-domain cumsum (900K x 2)",
      lambda i, f: jnp.cumsum(f[:, :2] + i[0], axis=0), idx[:1], feat[:900000])
