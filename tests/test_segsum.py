"""gather_rows: forward identity + VJP == scatter-add (deterministic tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianmesh_tpu.ops.segsum import gather_rows


@pytest.mark.parametrize("assume_grouped", [False, True])
def test_gather_rows_vjp_matches_scatter_add(assume_grouped):
    rng = np.random.default_rng(0)
    n, m, f = 50, 2000, 16
    # heavy-tailed multiplicities incl. one segment far beyond 128
    idx = rng.integers(0, n, m)
    idx[:400] = 7                       # 400-row segment (> _HEAD)
    idx[400:410] = 3
    if assume_grouped:
        idx = np.sort(idx)
    idx = jnp.asarray(idx.astype(np.int32))
    table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(m, f)).astype(np.float32))

    def f_new(t):
        return jnp.sum(gather_rows(t, idx, assume_grouped) * w)

    def f_ref(t):
        return jnp.sum(t[idx] * w)

    np.testing.assert_allclose(float(f_new(table)), float(f_ref(table)),
                               rtol=1e-6)
    g_new = jax.grad(f_new)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-6, atol=2e-5)


def test_gather_rows_empty_and_sentinel_rows():
    # destinations with zero incoming rows get exactly zero gradient
    idx = jnp.asarray([2, 2, 5], jnp.int32)
    table = jnp.ones((8, 4))
    g = jax.grad(lambda t: jnp.sum(gather_rows(t, idx) * 2.0))(table)
    expect = np.zeros((8, 4))
    expect[2] = 4.0
    expect[5] = 2.0
    np.testing.assert_array_equal(np.asarray(g), expect)


def test_gather_rows_counted_matches_scatter_add():
    from gaussianmesh_tpu.ops.segsum import gather_rows_counted

    rng = np.random.default_rng(1)
    n, m, f = 60, 3000, 16
    idx = rng.integers(0, n, m)
    idx[:500] = 11                      # segment far beyond _HEAD
    idx[500:504] = 0
    idx[504:520] = n - 1
    idx = jnp.asarray(idx.astype(np.int32))
    counts = jnp.zeros((n,), jnp.int32).at[idx].add(1)
    assert int(jnp.sum(counts)) == m
    table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(m, f)).astype(np.float32))

    def f_new(t):
        return jnp.sum(gather_rows_counted(t, idx, counts) * w)

    def f_ref(t):
        return jnp.sum(t[idx] * w)

    np.testing.assert_allclose(float(f_new(table)), float(f_ref(table)),
                               rtol=1e-6)
    g_new = jax.grad(f_new)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-6, atol=2e-5)


def test_expansion_gid_counts_exact():
    """PairExpansion.gid_counts must equal the true gid multiset — the
    counted reduction silently corrupts every gradient otherwise."""
    from gaussianmesh_tpu.ops import preprocess as prep_mod
    from gaussianmesh_tpu.ops import binning
    from tests.scenes import look_at_camera, random_gaussians

    W = H = 64
    cam = look_at_camera(W, H)
    sc = random_gaussians(300, seed=5)
    gx, gy = prep_mod.tile_grid(W, H)
    prep = prep_mod.preprocess(sc["means3d"], sc["cov6"], cam, W, H,
                               opacity=sc["opacity"])
    exp = binning.expand_pairs(prep, gx, gy, 300 * 10,
                               opacity=sc["opacity"], row_capacity=300 * 4)
    gid = np.asarray(exp.gid_slot)
    counts = np.asarray(exp.gid_counts)
    true_counts = np.bincount(gid[gid < 300], minlength=300)
    np.testing.assert_array_equal(counts, true_counts)
    assert int(exp.num_valid) == int((gid < 300).sum())
