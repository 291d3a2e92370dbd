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
