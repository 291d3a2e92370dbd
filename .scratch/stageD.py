"""Stage-D (rows -> pairs propagation) variants."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

m1 = 300_000
m = 900_000
gx, gy, N = 120, 68, 100_000
num_tiles = gx * gy

key = jax.random.PRNGKey(0)
widths = jax.random.randint(key, (m1,), 0, 6, jnp.int32)
tx0 = jax.random.randint(jax.random.PRNGKey(3), (m1,), 0, gx, jnp.int32)
ty = jax.random.randint(jax.random.PRNGKey(4), (m1,), 0, gy, jnp.int32)
gid = jax.random.randint(jax.random.PRNGKey(5), (m1,), 0, N, jnp.int32)

STEPS = 20
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a)
            bump = jnp.where(a2[0].reshape(-1)[0] > jnp.int32(2**30), c, 0)
            a2[0] = a2[0] + bump.astype(a2[0].dtype)
            r = fn(*a2)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(r))
            return (s * 1e-30).astype(jnp.int32) + c, None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

def common(widths):
    off32 = jnp.cumsum(widths).astype(jnp.int32)
    toff = jnp.concatenate([jnp.zeros(1, jnp.int32), off32])
    return toff

def d0_current(widths, tx0, ty, gid):
    toff = common(widths)
    total = toff[m1]
    vals = jnp.stack([tx0 - toff[:m1], ty, gid], axis=-1)
    diffs = jnp.diff(vals, prepend=0, axis=0)
    delta = jnp.zeros((m + 1, 3), jnp.int32).at[
        jnp.minimum(toff[:m1], m)].add(diffs, mode="drop")
    slot_vals = jnp.cumsum(delta, axis=0)[:m]
    j = jnp.arange(m, dtype=jnp.int32)
    tx = slot_vals[:, 0] + j
    pair_ok = j < total
    pair_tile = jnp.where(pair_ok, slot_vals[:, 1] * gx + tx, num_tiles)
    gid_slot = jnp.where(pair_ok, slot_vals[:, 2], N)
    return pair_tile, gid_slot

def d1_2col(widths, tx0, ty, gid):
    toff = common(widths)
    total = toff[m1]
    base = (ty * gx + tx0) - toff[:m1]
    vals = jnp.stack([base, gid], axis=-1)
    diffs = jnp.diff(vals, prepend=0, axis=0)
    delta = jnp.zeros((m + 1, 2), jnp.int32).at[
        jnp.minimum(toff[:m1], m)].add(diffs, mode="drop")
    slot_vals = jnp.cumsum(delta, axis=0)[:m]
    j = jnp.arange(m, dtype=jnp.int32)
    pair_ok = j < total
    pair_tile = jnp.where(pair_ok, slot_vals[:, 0] + j, num_tiles)
    gid_slot = jnp.where(pair_ok, slot_vals[:, 1], N)
    return pair_tile, gid_slot

def d2_rowof_gather(widths, tx0, ty, gid):
    toff = common(widths)
    total = toff[m1]
    ones = jnp.zeros((m + 1,), jnp.int32).at[
        jnp.minimum(toff[:m1], m)].add(jnp.where(widths > 0, 1, 0),
                                       mode="drop")
    row_of = jnp.cumsum(ones)[:m] - 1
    row_of = jnp.maximum(row_of, 0)
    base = (ty * gx + tx0) - toff[:m1]
    tab = jnp.stack([base, gid], axis=-1)
    sv = tab[row_of]
    j = jnp.arange(m, dtype=jnp.int32)
    pair_ok = j < total
    pair_tile = jnp.where(pair_ok, sv[:, 0] + j, num_tiles)
    gid_slot = jnp.where(pair_ok, sv[:, 1], N)
    return pair_tile, gid_slot

def d3_repeat(widths, tx0, ty, gid):
    toff = common(widths)
    total = toff[m1]
    base = (ty * gx + tx0) - toff[:m1]
    tab = jnp.stack([base, gid], axis=-1)
    sv = jnp.repeat(tab, widths, axis=0, total_repeat_length=m)
    j = jnp.arange(m, dtype=jnp.int32)
    pair_ok = j < total
    pair_tile = jnp.where(pair_ok, sv[:, 0] + j, num_tiles)
    gid_slot = jnp.where(pair_ok, sv[:, 1], N)
    return pair_tile, gid_slot

def d4_rank(widths, tx0, ty, gid):
    toff = common(widths)
    total = toff[m1]
    idx = jnp.arange(m1, dtype=jnp.int32)
    scatter_pos = jnp.where(widths > 0, toff[:m1], m)
    parent_of = jnp.full((m,), -1, jnp.int32).at[scatter_pos].max(
        idx, mode="drop")
    row_of = jnp.maximum(jax.lax.cummax(parent_of), 0)
    base = (ty * gx + tx0) - toff[:m1]
    tab = jnp.stack([base, gid], axis=-1)
    sv = tab[row_of]
    j = jnp.arange(m, dtype=jnp.int32)
    pair_ok = j < total
    pair_tile = jnp.where(pair_ok, sv[:, 0] + j, num_tiles)
    gid_slot = jnp.where(pair_ok, sv[:, 1], N)
    return pair_tile, gid_slot

r0 = jax.jit(d0_current)(widths, tx0, ty, gid)
for name, fn in [("d1_2col", d1_2col), ("d2_rowof_gather", d2_rowof_gather),
                 ("d3_repeat", d3_repeat), ("d4_rank", d4_rank)]:
    r = jax.jit(fn)(widths, tx0, ty, gid)
    ok = all(bool(jnp.array_equal(a, b)) for a, b in zip(r0, r))
    print(f"{name} equal: {ok}", flush=True)

timeit("d0 current (3-col diff-scatter)", d0_current, widths, tx0, ty, gid)
timeit("d1 2-col diff-scatter", d1_2col, widths, tx0, ty, gid)
timeit("d2 ones-scatter + wide gather", d2_rowof_gather, widths, tx0, ty, gid)
timeit("d3 jnp.repeat", d3_repeat, widths, tx0, ty, gid)
timeit("d4 scatter-max rank + gather", d4_rank, widths, tx0, ty, gid)
