"""Certify the closed-form blending semantics against the literal
sequential transcription of the reference CUDA loop."""

import jax.numpy as jnp
import numpy as np

from gaussianmesh_tpu.ops import oracle
from tests.scenes import look_at_camera, random_gaussians


def test_oracle_matches_sequential():
    w = h = 48
    cam = look_at_camera(w, h)
    sc = random_gaussians(300, seed=7)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    a = oracle.render_oracle(sc["means3d"], sc["cov6"], sc["opacity"],
                             sc["rgb"], cam, w, h, bg, pixel_chunk=512)
    b = oracle.render_sequential(sc["means3d"], sc["cov6"], sc["opacity"],
                                 sc["rgb"], cam, w, h, bg)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.final_t), np.asarray(b.final_t),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(a.n_contrib), np.asarray(b.n_contrib))


def test_oracle_dense_saturation():
    """Many opaque overlapping splats -> early-exit path must agree too."""
    w = h = 32
    cam = look_at_camera(w, h)
    sc = random_gaussians(500, seed=11, spread=0.3, opacity_range=(0.9, 1.0),
                          scale_range=(0.05, 0.3))
    bg = jnp.zeros(3)
    a = oracle.render_oracle(sc["means3d"], sc["cov6"], sc["opacity"],
                             sc["rgb"], cam, w, h, bg, pixel_chunk=256)
    b = oracle.render_sequential(sc["means3d"], sc["cov6"], sc["opacity"],
                                 sc["rgb"], cam, w, h, bg)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color), atol=2e-5)
    # saturated pixels exist and their transmittance is tiny
    assert float(jnp.min(a.final_t)) < 1e-3


def test_empty_scene_renders_background():
    w = h = 16
    cam = look_at_camera(w, h)
    sc = random_gaussians(4, seed=1)
    bg = jnp.asarray([0.25, 0.5, 0.75])
    out = oracle.render_oracle(sc["means3d"], sc["cov6"],
                               jnp.zeros_like(sc["opacity"]), sc["rgb"],
                               cam, w, h, bg)
    np.testing.assert_allclose(
        np.asarray(out.color),
        np.broadcast_to(np.asarray(bg)[:, None, None], (3, h, w)), atol=1e-6)
