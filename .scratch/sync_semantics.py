import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))

# ~33ms of real compute, tiny output (like bench's loop)
big = jax.jit(lambda a: jnp.float32(jnp.sum(
    jax.lax.scan(lambda c, _: (c @ a, None), a, None, length=10)[0]) * 1e-30))
v = float(big(a))  # warm + synced

t0 = time.perf_counter(); r = big(a); jax.block_until_ready(r)
print("dispatch+block:", (time.perf_counter()-t0)*1e3, "ms", flush=True)
t0 = time.perf_counter(); v = float(r)
print("then fetch of same:", (time.perf_counter()-t0)*1e3, "ms", flush=True)

# back-to-back dispatches: does the 2nd dispatch block on the 1st?
t0 = time.perf_counter()
r1 = big(a); r2 = big(a)
print("two dispatches, no sync:", (time.perf_counter()-t0)*1e3, "ms", flush=True)
t0 = time.perf_counter(); v = float(r2)
print("fetch r2:", (time.perf_counter()-t0)*1e3, "ms", flush=True)

# bench's exact pattern: block-only timing of second call
t0 = time.perf_counter(); out = big(a); jax.block_until_ready(out)
dt = time.perf_counter()-t0
print("bench-pattern timing would report:", dt*1e3, "ms", flush=True)
float(out)
