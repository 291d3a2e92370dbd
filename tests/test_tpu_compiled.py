"""Compiled-on-TPU kernel tests (pytest -m tpu with GM_TPU=1).

Every Pallas parity test elsewhere runs in interpret mode on CPU; these
exercise the COMPILED Mosaic kernels on the real chip — the thing that
actually ships. Includes the scan>=2 regression at bench scale: round 1's
scoreboard failure was a nondeterministic TPU backend ABORT triggered by
repeated in-program invocation of the fwd+bwd kernels at 1080p/100K when
the blend kernels read their inputs through scalar-prefetch-dependent
index maps (fixed by manual in-kernel DMA streaming; see
ops/tile_blend.py). Interpret mode cannot catch that class of failure.

Run:  GM_TPU=1 python -m pytest tests/ -m tpu -q
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from tests.scenes import look_at_camera, random_gaussians

pytestmark = pytest.mark.tpu

BG = jnp.asarray([0.15, 0.25, 0.35])


def _loss(out):
    return jnp.sum(out.color * out.color) + 0.1 * jnp.sum(out.final_t)


@pytest.fixture(scope="module")
def small_scene():
    w = h = 64
    cam = look_at_camera(w, h)
    sc = random_gaussians(400, seed=3)
    cfg = dict(width=w, height=h, max_per_tile=256, blend_chunk=128)
    return cam, sc, cfg


def test_compiled_forward_matches_jnp(small_scene):
    cam, sc, cfg = small_scene
    args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"], BG, cam)
    out_p = rasterize(*args, RasterizerConfig(use_pallas=True, **cfg))
    out_j = rasterize(*args, RasterizerConfig(use_pallas=False, **cfg))
    # 5e-5: the kernel folds opacity into the exponent
    # (exp(power + log op) vs op * exp(power)) and evaluates the
    # quadratic as an MXU contraction — same math, different rounding
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_j.color), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.final_t),
                               np.asarray(out_j.final_t), atol=5e-5)


def test_compiled_grads_match_jnp(small_scene):
    cam, sc, cfg = small_scene

    def f(use_pallas):
        c = RasterizerConfig(use_pallas=use_pallas, **cfg)

        def loss(means, cov6, op, rgb):
            return _loss(rasterize(means, cov6, op, rgb, BG, cam, c))

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"])
    g_p = f(True)(*args)
    g_j = f(False)(*args)
    for gp, gj, name in zip(g_p, g_j, ["means", "cov6", "op", "rgb"]):
        gp, gj = np.asarray(gp), np.asarray(gj)
        scale = np.abs(gj).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gj / scale, atol=2e-4,
                                   err_msg=name)


@pytest.mark.parametrize("steps", [2, 4])
def test_bench_scale_scan_regression(steps):
    """scan(fwd+bwd) at 1080p/100K — the exact shape that aborted the TPU
    backend in round 1 (BENCH_r01). Passing = backend survives repeated
    in-program invocation AND outputs stay finite and step-invariant."""
    width, height, n = 1920, 1080, 100_000
    cfg = RasterizerConfig(width=width, height=height, max_per_tile=1024,
                           blend_chunk=128, pair_capacity_per_gaussian=9,
                           row_capacity_per_gaussian=3, use_pallas=True)
    cam = look_at_camera(width, height, distance=4.0)
    sc = random_gaussians(n, seed=0, spread=1.4, scale_range=(0.004, 0.02))
    bg = jnp.ones(3)

    def one(means, cov6, op, rgb):
        out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
        return jnp.sum(out.color * out.color), out.num_rendered

    @jax.jit
    def loop(means, cov6, op, rgb):
        def body(carry, _):
            (loss, nrend), grads = jax.value_and_grad(
                one, argnums=(0, 1, 2, 3), has_aux=True)(
                    means + carry * 1e-30, cov6, op, rgb)
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
            return loss + gsum * 1e-30, (loss, nrend)
        _, (losses, nrends) = jax.lax.scan(
            body, 0.0, None, length=steps)
        return losses, nrends

    losses, nrends = jax.block_until_ready(
        loop(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"]))
    losses = np.asarray(losses)
    nrends = np.asarray(nrends)
    assert np.isfinite(losses).all(), losses
    # every iteration computes the same thing — any drift means the
    # kernels read stale/garbage memory on reinvocation
    np.testing.assert_array_equal(nrends, nrends[0])
    np.testing.assert_allclose(losses, losses[0], rtol=1e-6)
    assert nrends[0] > 100_000  # a real workload, not a degenerate render
