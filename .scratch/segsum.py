"""Microbench: per-gaussian gradient reduction alternatives.

Current: XLA scatter-add (the autodiff VJP of feat[gid]).
Candidates:
  A. 17-operand stable sort by gid + cumsum + boundary diff
  B. 2-operand sort (gid, idx) + wide row gather + cumsum + boundary diff
  C. wide row scatter into expansion domain (inverse perm known) + cumsum
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = 1_048_576   # pairs (padded)
N = 100_000     # gaussians
F = 16

key = jax.random.PRNGKey(0)
gid = jax.random.randint(key, (M,), 0, N + 1, jnp.int32)  # N = dummy
d = jax.random.normal(jax.random.PRNGKey(1), (M, F), jnp.float32)
# counts per gid for boundary variant
counts = jnp.bincount(gid, length=N + 1)

STEPS = 10
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a); a2[-1] = a2[-1] + c * 1e-30
            r = fn(*a2)
            return jnp.sum(r) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

def scatter_add(gid, d):
    return jnp.zeros((N + 1, F), jnp.float32).at[gid].add(d)

def sort17(gid, d):
    ops = (gid,) + tuple(d[:, i] for i in range(F))
    out = jax.lax.sort(ops, num_keys=1, is_stable=False)
    ds = jnp.stack(out[1:], axis=-1)            # (M, F) sorted by gid
    cs = jnp.cumsum(ds, axis=0)
    b = jnp.concatenate([jnp.zeros(1, jnp.int32),
                         jnp.cumsum(counts).astype(jnp.int32)])
    csz = jnp.concatenate([jnp.zeros((1, F), jnp.float32), cs])
    return csz[b[1:]] - csz[b[:-1]]

def sort2_gather(gid, d):
    _, idx = jax.lax.sort((gid, jnp.arange(M, dtype=jnp.int32)), num_keys=1,
                          is_stable=False)
    ds = d[idx]
    cs = jnp.cumsum(ds, axis=0)
    b = jnp.concatenate([jnp.zeros(1, jnp.int32),
                         jnp.cumsum(counts).astype(jnp.int32)])
    csz = jnp.concatenate([jnp.zeros((1, F), jnp.float32), cs])
    return csz[b[1:]] - csz[b[:-1]]

# C: wide row scatter (as if we knew dest positions making gid contiguous)
dest = jnp.argsort(gid).astype(jnp.int32)   # precomputed (stop-grad in real use)
inv = jnp.zeros((M,), jnp.int32).at[dest].set(jnp.arange(M, dtype=jnp.int32))
def wide_scatter(dest_idx, gid, d):
    ds = jnp.zeros((M, F), jnp.float32).at[dest_idx].set(d)
    cs = jnp.cumsum(ds, axis=0)
    b = jnp.concatenate([jnp.zeros(1, jnp.int32),
                         jnp.cumsum(counts).astype(jnp.int32)])
    csz = jnp.concatenate([jnp.zeros((1, F), jnp.float32), cs])
    return csz[b[1:]] - csz[b[:-1]]

timeit("scatter_add (current)", scatter_add, gid, d)
timeit("sort17 + cumsum + bounds", sort17, gid, d)
timeit("sort2 + row gather + cumsum", sort2_gather, gid, d)
timeit("wide row scatter + cumsum", wide_scatter, inv, gid, d)

# correctness
r0 = scatter_add(gid, d)[:N]
r1 = sort17(gid, d)[:N]
print("sort17 max diff:", float(jnp.abs(r0 - r1).max()))
