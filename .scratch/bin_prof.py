import sys, time, functools
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from gaussianmesh_tpu.ops import preprocess as prep_mod, binning
from scenes import look_at_camera, random_gaussians

W, H, N = 1920, 1080, 100_000
cam = look_at_camera(W, H, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
gx, gy = prep_mod.tile_grid(W, H)
NT = gx * gy
CHUNK = 128
m_cap, r_cap = N * 9, N * 3
p_cap = -(-(N * 9 + NT * (CHUNK // 2)) // CHUNK) * CHUNK
op = sc["opacity"]

prep = jax.jit(lambda a, b, o: prep_mod.preprocess(a, b, cam, W, H, opacity=o))(
    sc["means3d"], sc["cov6"], op)
prep = jax.tree.map(jax.lax.stop_gradient, prep)

def bench(fn, *args, steps=30):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps): o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / steps * 1e3

TILE = binning.TILE

# sub-phase 1: depth sort + stage-1 row expansion inputs
def s1(prep, op):
    n = prep.depth.shape[0]
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)
    rmin = prep.rect_min[order].astype(jnp.float32)
    rmax = prep.rect_max[order].astype(jnp.float32)
    valid_r = prep.valid[order]
    heights = jnp.where(valid_r, (rmax[:, 1] - rmin[:, 1]).astype(jnp.int32), 0)
    roff, rank1, total_rows, row_overflow = binning._offset_expand(heights, r_cap)
    return order, rmin, rmax, roff, rank1, total_rows

print("s1 sort+rowexp     %.2f" % bench(s1, prep, op), flush=True)
order, rmin, rmax, roff, rank1, total_rows = jax.jit(s1)(prep, op)

def s2(prep, op, order, rmin, rmax, roff, rank1, total_rows):
    n = prep.depth.shape[0]
    m2d = prep.mean2d[order]
    con = prep.conic[order]
    op_r = op.reshape(-1)[order]
    qcut_g = 2.0 * jnp.log(jnp.maximum(op_r, 1e-12) / binning.ALPHA_MIN) + binning._CULL_SLACK
    tab1 = jnp.stack([
        roff[:n].astype(jnp.float32), rmin[:, 1], m2d[:, 0], m2d[:, 1],
        con[:, 0], con[:, 1], con[:, 2], jnp.maximum(qcut_g, 0.0),
        rmin[:, 0], rmax[:, 0], order.astype(jnp.float32)], axis=-1)
    row_tab = tab1[rank1]
    i1 = jnp.arange(r_cap, dtype=jnp.int32)
    ty = row_tab[:, 1].astype(jnp.int32) + (i1 - row_tab[:, 0].astype(jnp.int32))
    ca, cb, cc = row_tab[:, 4], row_tab[:, 5], row_tab[:, 6]
    pd = (ca > 0) & (cc > 0) & (ca * cc > cb * cb)
    dx_min, dx_max = binning._row_x_extent(row_tab[:, 3], ca, cb, cc, row_tab[:, 7],
                                           ty.astype(jnp.float32))
    mx = row_tab[:, 2]
    lo = jnp.where(pd, jnp.floor((mx + dx_min) / TILE), row_tab[:, 8])
    hi = jnp.where(pd, jnp.floor((mx + dx_max) / TILE) + 1.0, row_tab[:, 9])
    tx0 = jnp.clip(lo, row_tab[:, 8], row_tab[:, 9]).astype(jnp.int32)
    tx1 = jnp.clip(hi, row_tab[:, 8], row_tab[:, 9]).astype(jnp.int32)
    widths = jnp.where(i1 < total_rows, jnp.maximum(tx1 - tx0, 0), 0)
    return widths, tx0, ty, row_tab[:, 10]

print("s2 rowtab+extent   %.2f" % bench(s2, prep, op, order, rmin, rmax, roff, rank1, total_rows), flush=True)
widths, tx0, ty, gid_f = jax.jit(s2)(prep, op, order, rmin, rmax, roff, rank1, total_rows)

def s3(widths, tx0, ty, gid_f):
    toff, rank2, total, pair_lost = binning._offset_expand(widths, m_cap)
    tab2 = jnp.stack([toff[:r_cap].astype(jnp.float32), tx0.astype(jnp.float32),
                      ty.astype(jnp.float32), gid_f], axis=-1)
    slot_tab = tab2[rank2]
    j = jnp.arange(m_cap, dtype=jnp.int32)
    tx = slot_tab[:, 1].astype(jnp.int32) + (j - slot_tab[:, 0].astype(jnp.int32))
    tyj = slot_tab[:, 2].astype(jnp.int32)
    pair_ok = j < total
    pair_tile = jnp.where(pair_ok, tyj * gx + tx, NT)
    gid_slot = jnp.where(pair_ok, slot_tab[:, 3].astype(jnp.int32), N)
    return pair_tile, gid_slot, total

print("s3 pairexp         %.2f" % bench(s3, widths, tx0, ty, gid_f), flush=True)
pair_tile, gid_slot, total = jax.jit(s3)(widths, tx0, ty, gid_f)

def s4(pair_tile, gid_slot):
    return jax.lax.sort((pair_tile, gid_slot), num_keys=1, is_stable=True)

print("s4 sort            %.2f" % bench(s4, pair_tile, gid_slot), flush=True)
sorted_tile, sorted_gid = jax.jit(s4)(pair_tile, gid_slot)

def s5(sorted_tile, sorted_gid):
    starts = jnp.searchsorted(sorted_tile, jnp.arange(NT + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    raw_counts = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw_counts, 1024)
    aligned_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    astarts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(aligned_counts).astype(jnp.int32)])
    astarts = jnp.minimum(astarts, p_cap)
    seg_vals = jnp.stack([starts[:NT] - astarts[:NT], astarts[:NT] + counts], axis=-1)
    seg = binning._segment_const(seg_vals, astarts[:NT], p_cap)
    ja = jnp.arange(p_cap, dtype=jnp.int32)
    aligned_src = jnp.where(ja < seg[:, 1], ja + seg[:, 0], -1)
    shift_vals = jnp.stack([astarts[:NT] - starts[:NT], starts[:NT] + counts], axis=-1)
    segp = binning._segment_const(shift_vals, starts[:NT], m_cap)
    p_idx = jnp.arange(m_cap, dtype=jnp.int32)
    in_cnt = (p_idx < segp[:, 1]) & (sorted_tile < NT)
    sorted_shift = jnp.where(in_cnt, segp[:, 0], p_cap - p_idx)
    pb = p_cap // CHUNK
    block_starts = jnp.arange(pb + 1, dtype=jnp.int32) * CHUNK
    block_tile = jnp.searchsorted(astarts, block_starts, side="right").astype(jnp.int32) - 1
    return aligned_src, sorted_shift, jnp.clip(block_tile, 0, NT)

print("s5 ranges+maps     %.2f" % bench(s5, sorted_tile, sorted_gid), flush=True)
