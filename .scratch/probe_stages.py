import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
t0=time.time()
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("import", time.time()-t0, flush=True)
t0=time.time(); d=jax.devices(); print("devices", d, time.time()-t0, flush=True)
t0=time.time(); x=jnp.ones((1024,1024)); y=(x@x).block_until_ready(); print("matmul", time.time()-t0, flush=True)
