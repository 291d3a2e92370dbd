"""Stage-level profile of build_tile_lists at bench scale."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.ops import binning, preprocess as prep_mod
from gaussianmesh_tpu.ops.binning import (_segment_const, _row_x_extent,
                                          _offset_expand, _tile_starts, TILE)
from scenes import look_at_camera, random_gaussians

W, H, N = 1920, 1080, 100_000
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3)
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = cfg.grid
num_tiles = cfg.num_tiles
chunk = 128
m = cfg.expand_capacity(N)
m1 = cfg.row_capacity(N)
p_cap = cfg.pair_capacity(N)
prep = jax.jit(lambda ms, c: prep_mod.preprocess(ms, c, cam, W, H,
                                                 opacity=sc["opacity"]))(
    sc["means3d"], sc["cov6"])
prep = jax.tree.map(jax.lax.stop_gradient, prep)
op_flat = sc["opacity"].reshape(-1)
n = N

STEPS = 20
def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            a2 = list(a)
            a2[0] = jax.tree.map(
                lambda x: x + (c * 1e-30).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a2[0])
            r = fn(*a2)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(r))
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return c
    out = loop(*args); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(*args); jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

# stage A: depth argsort
def f_order(prep):
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    return jnp.argsort(depth_key).astype(jnp.int32)
timeit("A depth argsort (N)", f_order, prep)
order = jax.jit(f_order)(prep)

# stage B: gtab build + wide gather + heights + offset_expand rows
def f_stageB(prep):
    qcut_all = 2.0 * jnp.log(jnp.maximum(op_flat, 1e-12) * 255.0) + 1e-4
    gtab = jnp.stack([
        prep.rect_min[:, 1].astype(jnp.float32),
        prep.mean2d[:, 0], prep.mean2d[:, 1],
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        jnp.maximum(qcut_all, 0.0),
        prep.rect_min[:, 0].astype(jnp.float32),
        prep.rect_max[:, 0].astype(jnp.float32),
        prep.rect_max[:, 1].astype(jnp.float32),
        prep.valid.astype(jnp.float32),
        jnp.arange(n, dtype=jnp.float32),
    ], axis=-1)
    gtab_o = gtab[order]
    heights = jnp.where(gtab_o[:, 10] > 0.0,
                        (gtab_o[:, 9] - gtab_o[:, 0]), 0.0).astype(jnp.int32)
    roff, rank1, total_rows, row_overflow = _offset_expand(heights, m1)
    tab1 = jnp.concatenate([
        roff[:n, None].astype(jnp.float32), gtab_o[:, :9], gtab_o[:, 11:12],
    ], axis=-1)
    row_tab = tab1[rank1]
    return row_tab, roff, total_rows
timeit("B row expansion (N->m1 rows)", f_stageB, prep)
row_tab, roff, total_rows = jax.jit(f_stageB)(prep)

# stage C: row x-extents
def f_stageC(row_tab):
    i1 = jnp.arange(m1, dtype=jnp.int32)
    ty = row_tab[:, 1].astype(jnp.int32) + (i1 - row_tab[:, 0].astype(jnp.int32))
    ca, cb, cc = row_tab[:, 4], row_tab[:, 5], row_tab[:, 6]
    pd = (ca > 0) & (cc > 0) & (ca * cc > cb * cb)
    dx_min, dx_max = _row_x_extent(row_tab[:, 3], ca, cb, cc, row_tab[:, 7],
                                   ty.astype(jnp.float32))
    mx = row_tab[:, 2]
    lo = jnp.where(pd, jnp.floor((mx + dx_min) / TILE), row_tab[:, 8])
    hi = jnp.where(pd, jnp.floor((mx + dx_max) / TILE) + 1.0, row_tab[:, 9])
    tx0 = jnp.clip(lo, row_tab[:, 8], row_tab[:, 9]).astype(jnp.int32)
    tx1 = jnp.clip(hi, row_tab[:, 8], row_tab[:, 9]).astype(jnp.int32)
    widths = jnp.where(i1 < total_rows, jnp.maximum(tx1 - tx0, 0), 0)
    return tx0, ty, widths
timeit("C row x-extents (m1)", f_stageC, row_tab)
tx0, ty, widths = jax.jit(f_stageC)(row_tab)

# stage D: pair expansion (diff-scatter + cumsum)
def f_stageD(widths, tx0, ty, row_tab):
    off32 = jnp.cumsum(widths).astype(jnp.int32)
    toff = jnp.concatenate([jnp.zeros(1, jnp.int32), off32])
    total = toff[m1]
    vals = jnp.stack([tx0 - toff[:m1], ty,
                      row_tab[:, 10].astype(jnp.int32)], axis=-1)
    slot_vals = _segment_const(vals, jnp.minimum(toff[:m1], m), m)
    j = jnp.arange(m, dtype=jnp.int32)
    tx = slot_vals[:, 0] + j
    tyj = slot_vals[:, 1]
    pair_ok = j < total
    pair_tile = jnp.where(pair_ok, tyj * gx + tx, num_tiles)
    gid_slot = jnp.where(pair_ok, slot_vals[:, 2], n)
    return pair_tile, gid_slot
timeit("D pair expansion (m1->m)", f_stageD, widths, tx0, ty, row_tab)
pair_tile, gid_slot = jax.jit(f_stageD)(widths, tx0, ty, row_tab)

# stage E: the sort
def f_sort(pair_tile, gid_slot):
    return jax.lax.sort((pair_tile, gid_slot), num_keys=1, is_stable=True)
timeit("E stable sort (m)", f_sort, pair_tile, gid_slot)
sorted_tile, sorted_gid = jax.jit(f_sort)(pair_tile, gid_slot)

# stage F: starts + aligned bookkeeping
def f_stageF(sorted_tile):
    starts = _tile_starts(sorted_tile, num_tiles)
    raw_counts = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw_counts, cfg.max_per_tile)
    aligned_counts = ((counts + chunk - 1) // chunk) * chunk
    astarts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(aligned_counts).astype(jnp.int32)])
    astarts = jnp.minimum(astarts, p_cap)
    shift_vals = jnp.stack([astarts[:num_tiles] - starts[:num_tiles],
                            starts[:num_tiles] + counts], axis=-1)
    segp = _segment_const(shift_vals, starts[:num_tiles], m)
    p_idx = jnp.arange(m, dtype=jnp.int32)
    in_cnt = (p_idx < segp[:, 1]) & (sorted_tile < num_tiles)
    sorted_shift = jnp.where(in_cnt, segp[:, 0], p_cap - p_idx)
    pb = p_cap // chunk
    block_starts = jnp.arange(pb + 1, dtype=jnp.int32) * chunk
    delta = jnp.zeros((pb + 1,), jnp.int32).at[astarts // chunk].add(
        1, mode="drop")
    block_tile = jnp.cumsum(delta).astype(jnp.int32) - 1
    return starts, counts, astarts, sorted_shift, block_tile
timeit("F starts/aligned (m)", f_stageF, sorted_tile)

# full
def f_full(prep):
    return binning.build_tile_lists(prep, gx, gy, cfg.max_per_tile,
                                    expand_capacity=m, pair_capacity=p_cap,
                                    chunk=chunk, opacity=op_flat,
                                    row_capacity=m1)
timeit("FULL build_tile_lists", f_full, prep)
