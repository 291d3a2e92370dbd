"""Production rasterizer (binning + tile blend) vs the oracle, + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianmesh_tpu.ops import oracle
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from tests.scenes import look_at_camera, random_gaussians

W = H = 64
BG = jnp.asarray([0.15, 0.25, 0.35])


def _cfg(use_pallas: bool, **kw):
    base = dict(width=W, height=H, max_per_tile=256,
                blend_chunk=128,
                use_pallas=use_pallas)
    base.update(kw)
    return RasterizerConfig(**base)


@pytest.fixture(scope="module")
def scene():
    cam = look_at_camera(W, H)
    sc = random_gaussians(400, seed=3)
    return cam, sc


def test_jnp_pipeline_matches_oracle(scene):
    cam, sc = scene
    out = rasterize(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"],
                    BG, cam, _cfg(False))
    ref = oracle.render_oracle(sc["means3d"], sc["cov6"], sc["opacity"],
                               sc["rgb"], cam, W, H, BG)
    assert int(out.tile_overflow) == 0 and int(out.rect_overflow) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.final_t), np.asarray(ref.final_t),
                               atol=3e-5)
    # n_contrib counts the last contributor's rank within the tile's pair
    # list; binning culls pairs the oracle still enumerates (dead bbox
    # corners), so ranks can only shrink — and a pixel has contributors in
    # one iff it does in the other.
    pipe_nc = np.asarray(out.n_contrib, np.int32)
    orac_nc = np.asarray(ref.n_contrib)
    assert ((pipe_nc > 0) == (orac_nc > 0)).all()
    assert (pipe_nc <= orac_nc).all()


@pytest.mark.parametrize("chunk", [128, 256])
def test_pallas_interpret_matches_jnp(scene, chunk):
    cam, sc = scene
    out_j = rasterize(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"],
                      BG, cam, _cfg(False))
    with jax.disable_jit():  # interpret-mode pallas runs under disable_jit on CPU
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out_p = rasterize(sc["means3d"], sc["cov6"], sc["opacity"],
                              sc["rgb"], BG, cam,
                              _cfg(True, blend_chunk=chunk))
    # 3e-5: the kernel evaluates the quadratic as an MXU monomial
    # contraction in tile-relative coordinates; the jnp path is
    # elementwise — same math, different rounding order
    np.testing.assert_allclose(np.asarray(out_p.color), np.asarray(out_j.color),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_p.final_t),
                               np.asarray(out_j.final_t), atol=3e-5)


def _loss_fn(use_pallas, **kw):
    cfg = _cfg(use_pallas, **kw)

    def loss(means3d, cov6, opacity, rgb, cam, target):
        out = rasterize(means3d, cov6, opacity, rgb, BG, cam, cfg)
        return jnp.sum((out.color - target) ** 2) + 0.1 * jnp.sum(out.final_t)

    return loss


def test_gradients_flow_and_match_oracle(scene):
    """Autodiff grads through the production jnp pipeline vs oracle renderer."""
    cam, sc = scene
    target = jnp.zeros((3, H, W))

    def oracle_loss(means3d, cov6, opacity, rgb):
        out = oracle.render_oracle(means3d, cov6, opacity, rgb, cam, W, H, BG)
        return jnp.sum((out.color - target) ** 2) + 0.1 * jnp.sum(out.final_t)

    loss = _loss_fn(False)
    g_pipe = jax.grad(loss, argnums=(0, 1, 2, 3))(
        sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"], cam, target)
    g_orac = jax.grad(oracle_loss, argnums=(0, 1, 2, 3))(
        sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"])
    for gp, go, name in zip(g_pipe, g_orac, ["means", "cov6", "op", "rgb"]):
        gp, go = np.asarray(gp), np.asarray(go)
        scale = np.abs(go).max() + 1e-8
        np.testing.assert_allclose(gp / scale, go / scale, atol=2e-4,
                                   err_msg=name)


@pytest.mark.parametrize("chunk", [128, 256])
def test_pallas_interpret_grads_match_jnp(scene, chunk):
    cam, sc = scene
    target = jnp.zeros((3, H, W))
    args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"], cam, target)
    g_j = jax.grad(_loss_fn(False), argnums=(0, 1, 2, 3))(*args)
    from jax.experimental.pallas import tpu as pltpu
    with jax.disable_jit(), pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(_loss_fn(True, blend_chunk=chunk),
                       argnums=(0, 1, 2, 3))(*args)
    for gj, gp, name in zip(g_j, g_p, ["means", "cov6", "op", "rgb"]):
        gj, gp = np.asarray(gj), np.asarray(gp)
        scale = np.abs(gj).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gj / scale, atol=2e-4,
                                   err_msg=name)


def test_finite_difference_check():
    """check_grads on a tiny scene through the full jnp pipeline."""
    cam = look_at_camera(32, 32)
    sc = random_gaussians(40, seed=9)
    cfg = RasterizerConfig(width=32, height=32, max_per_tile=128,
                           use_pallas=False)

    def f(opacity, rgb):
        out = rasterize(sc["means3d"], sc["cov6"], opacity, rgb, BG, cam, cfg)
        return jnp.sum(out.color ** 2)

    from jax.test_util import check_grads
    check_grads(f, (sc["opacity"], sc["rgb"]), order=1, modes=("rev",),
                atol=2e-2, rtol=2e-2)


def test_gradients_finite_with_dead_capacity_rows():
    """Dead (masked) capacity rows must not inject NaNs into gradients —
    zero quats, zero conics and culled rows all backprop exact zeros."""
    from gaussianmesh_tpu.models import mesh_gaussians as mgs
    from gaussianmesh_tpu.models import render as render_mod
    from tests.meshes import icosphere

    v, f = icosphere(0)
    p, b, _, _ = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                      capacity=128, vertex_capacity=128)
    cam = look_at_camera(32, 32, distance=3.0)
    cfg = RasterizerConfig(width=32, height=32, max_per_tile=64,
                           use_pallas=False)

    def loss(p):
        arrays = render_mod.mesh_model_arrays(p, b, cam, 3)
        out = render_mod.render(arrays, cam, cfg, jnp.zeros(3))
        return jnp.sum(out.color ** 2)

    g = jax.grad(loss)(p)
    for name in type(g).__dataclass_fields__:
        arr = np.asarray(getattr(g, name))
        assert np.isfinite(arr).all(), name
        # dead rows get exactly zero gradient
        assert np.abs(arr[f.shape[0]:]).max() == 0.0, name


def test_pair_overflow_clamps_counts_to_granted_blocks():
    """Aligned-domain overflow must degrade gracefully: a tile only keeps
    pairs it was granted aligned space for. Tiles starved of blocks must
    report count 0 — otherwise the blend kernel never writes their output
    rows and uninitialized memory passes the counts>0 mask (seen as NaN
    pixels on TPU under jit)."""
    from gaussianmesh_tpu.ops import binning

    num_tiles, chunk = 8, 128
    half = binning.ALIGN
    # 6 live tiles x 1 pair -> aligned demand 6 granules, capacity only 4
    sorted_tile = jnp.asarray([0, 1, 2, 4, 5, 7], jnp.int32)
    sorted_gid = jnp.arange(6, dtype=jnp.int32)
    p_cap = -(-4 * half // chunk) * chunk
    tiles = binning.finish_tile_lists(sorted_tile, sorted_gid,
                                      num_valid=jnp.int32(6),
                                      rect_overflow=jnp.int32(0),
                                      num_tiles=num_tiles, max_per_tile=64,
                                      pair_capacity=p_cap, chunk=chunk)
    counts = np.asarray(tiles.counts)
    astarts = np.asarray(tiles.aligned_starts)
    block_tile = np.asarray(tiles.block_tile)
    assert int(tiles.pair_overflow) == 2 * half
    # granted tiles keep their pair; starved tiles are clamped to zero
    np.testing.assert_array_equal(counts[[0, 1, 2, 4]], 1)
    np.testing.assert_array_equal(counts[[3, 5, 6, 7]], 0)
    # invariant: every tile with count>0 owns at least one aligned
    # half-granule (block_tile is per-half)
    for t in range(num_tiles):
        if counts[t] > 0:
            assert (block_tile[:p_cap // half] == t).any(), t
        assert astarts[t + 1] - astarts[t] >= counts[t]


def test_pair_overflow_render_stays_finite_and_reported():
    """End-to-end: a starved pair capacity must drop far tiles to
    background, not emit garbage; overflow is reported."""

    class TinyPairCap(RasterizerConfig):
        def pair_capacity(self, n, num_tiles=None):
            return 2 * self.blend_chunk   # room for ~2 tiles only

    cam = look_at_camera(W, H)
    sc = random_gaussians(400, seed=3)
    cfg = TinyPairCap(width=W, height=H, max_per_tile=256,
                      blend_chunk=128,
                      use_pallas=False)
    out = rasterize(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"],
                    BG, cam, cfg)
    assert int(out.pair_overflow) > 0
    assert np.isfinite(np.asarray(out.color)).all()
    assert np.isfinite(np.asarray(out.final_t)).all()
    # starved tiles fall back to pure background (final_t == 1)
    ft = np.asarray(out.final_t)
    assert (ft == 1.0).any()


@pytest.mark.parametrize("chunk", [128, 256])
def test_overflow_clamped_tiles_with_odd_granule_offsets(chunk):
    """max_per_tile clamping leaves each tile's EXCESS pairs between the
    granted regions in the sorted domain, so consecutive granules in one
    blend block can be arbitrarily far apart. A shared block-anchored
    fetch misses the later granules (round-3 bug: 0.5 max-abs pixel error
    at 256px under overflow); granule-independent DMA must keep overflow
    renders at jnp parity. The scene forces MIXED blocks: a heavy
    clamped cluster preceded by small odd-granule tiles."""
    rng = np.random.default_rng(21)
    cam = look_at_camera(W, H)
    # heavy cluster (one tile neighborhood) + light spread
    n_heavy, n_light = 900, 300
    sc = random_gaussians(n_heavy + n_light, seed=21)
    means = np.array(sc["means3d"])
    means[:n_heavy] = means[:n_heavy] * 0.08 + np.array([0.25, 0.2, 0.0])
    means3d = jnp.asarray(means)

    kw = dict(max_per_tile=70, pair_capacity_per_gaussian=14,
              row_capacity_per_gaussian=6)
    out_j = rasterize(means3d, sc["cov6"], sc["opacity"], sc["rgb"],
                      BG, cam, _cfg(False, **kw))
    assert int(out_j.tile_overflow) > 0  # the clamp actually fired
    with jax.disable_jit():
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out_p = rasterize(means3d, sc["cov6"], sc["opacity"],
                              sc["rgb"], BG, cam,
                              _cfg(True, blend_chunk=chunk, **kw))
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_j.color), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.final_t),
                               np.asarray(out_j.final_t), atol=5e-5)


def test_composite_static_pairs_matches_monolithic(scene):
    """rasterize_composite (cached static pair domain, BASELINE config 5)
    == rasterize of the concatenated scene. Distinct depths everywhere,
    so the depth-tie emission-order caveat never triggers."""
    from gaussianmesh_tpu.ops.rasterize import (precompute_static_pairs,
                                                rasterize_composite)
    cam, sc = scene
    sc2 = random_gaussians(300, seed=11)
    cfg = _cfg(False)
    static = precompute_static_pairs(sc2["means3d"], sc2["cov6"],
                                     sc2["opacity"], sc2["rgb"], cam, cfg)
    out_c = rasterize_composite(sc["means3d"], sc["cov6"], sc["opacity"],
                                sc["rgb"], BG, cam, cfg, static)
    cat = {k: jnp.concatenate([sc[k], sc2[k]]) for k in
           ("means3d", "cov6", "opacity", "rgb")}
    out_m = rasterize(cat["means3d"], cat["cov6"], cat["opacity"],
                      cat["rgb"], BG, cam, cfg)
    assert int(out_c.pair_overflow) == 0
    np.testing.assert_allclose(np.asarray(out_c.color),
                               np.asarray(out_m.color), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_c.final_t),
                               np.asarray(out_m.final_t), atol=3e-5)


def test_composite_pallas_interpret_matches_jnp(scene):
    from gaussianmesh_tpu.ops.rasterize import (precompute_static_pairs,
                                                rasterize_composite)
    cam, sc = scene
    sc2 = random_gaussians(300, seed=11)
    cfg_j = _cfg(False)
    static_j = precompute_static_pairs(sc2["means3d"], sc2["cov6"],
                                       sc2["opacity"], sc2["rgb"], cam,
                                       cfg_j)
    out_j = rasterize_composite(sc["means3d"], sc["cov6"], sc["opacity"],
                                sc["rgb"], BG, cam, cfg_j, static_j)
    with jax.disable_jit():
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            cfg_p = _cfg(True)
            static_p = precompute_static_pairs(
                sc2["means3d"], sc2["cov6"], sc2["opacity"], sc2["rgb"],
                cam, cfg_p)
            out_p = rasterize_composite(
                sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"], BG,
                cam, cfg_p, static_p)
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_j.color), atol=3e-5)
