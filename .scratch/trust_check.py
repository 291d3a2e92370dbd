import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
mm = jax.jit(lambda a: a @ a)
r = mm(a); jax.block_until_ready(r)
for _ in range(3):
    t0 = time.perf_counter(); r = mm(a); jax.block_until_ready(r)
    print("matmul 4096^3 f32:", (time.perf_counter()-t0)*1e3, "ms (expect ~2.8 at 49TF)", flush=True)
# chain 10 matmuls in one dispatch: expect ~28ms
mm10 = jax.jit(lambda a: jax.lax.scan(lambda c, _: (c @ a, None), a, None, length=10)[0])
r = mm10(a); jax.block_until_ready(r)
for _ in range(2):
    t0 = time.perf_counter(); r = mm10(a); jax.block_until_ready(r)
    print("10x matmul scan:", (time.perf_counter()-t0)*1e3, "ms", flush=True)
