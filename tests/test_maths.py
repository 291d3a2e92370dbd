import jax.numpy as jnp
import numpy as np

from gaussianmesh_tpu.utils import maths, sh, subdivision


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = maths.quat_to_rotmat(jnp.asarray(q))
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (64, 3, 3)),
                               atol=1e-5)
    assert np.allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    q2 = np.asarray(maths.rotmat_to_quat(R))
    # same rotation up to sign (we canonicalize w >= 0)
    qc = np.where(q[:, :1] < 0, -q, q)
    np.testing.assert_allclose(q2, qc, atol=1e-5)


def test_covariance_psd_and_strip_roundtrip():
    rng = np.random.default_rng(1)
    s = rng.uniform(0.1, 2.0, (32, 3)).astype(np.float32)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cov = maths.build_covariance(jnp.asarray(s), jnp.asarray(q))
    evs = np.linalg.eigvalsh(np.asarray(cov))
    assert (evs > 0).all()
    # eigenvalues are squared scales
    np.testing.assert_allclose(np.sort(evs, axis=1), np.sort(s * s, axis=1),
                               rtol=1e-3)
    c6 = maths.strip_symmetric(cov)
    np.testing.assert_allclose(np.asarray(maths.unstrip_symmetric(c6)),
                               np.asarray(cov), atol=1e-6)


def test_polar_decompose():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(16, 3, 3)).astype(np.float32)
    R, S = maths.polar_decompose_rs(jnp.asarray(A))
    R, S = np.asarray(R), np.asarray(S)
    np.testing.assert_allclose(R @ S, A, atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    np.testing.assert_allclose(S, np.swapaxes(S, 1, 2), atol=1e-4)


def test_sh_degree0_and_known_values():
    # degree 0: color = C0 * sh0 + 0.5
    coeff = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.asarray(np.random.default_rng(3).normal(size=(4, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    out = sh.eval_sh(coeff, dirs, 0)
    np.testing.assert_allclose(np.asarray(out), sh.C0, atol=1e-6)

    # degree 1 along +z: basis = [C0, 0, C1, 0]
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    c = jnp.zeros((1, 16, 3)).at[0, 2, 0].set(2.0)
    out = sh.eval_sh(c, d, 1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 2.0 * sh.C1, atol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (8, 3)))
    np.testing.assert_allclose(np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))),
                               np.asarray(rgb), atol=1e-6)


def test_subdivision_children_cover_parent():
    rng = np.random.default_rng(5)
    v1, v2, v3 = (jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
                  for _ in range(3))
    vidx = jnp.arange(30, dtype=jnp.int32).reshape(10, 3)
    (c1, c2, c3), c_vidx, new_v = subdivision.subdivide(v1, v2, v3, vidx, 4, 100)

    def area(a, b, c):
        return 0.5 * np.linalg.norm(np.cross(np.asarray(b - a), np.asarray(c - a)), axis=-1)

    parent = area(v1, v2, v3)
    child_total = sum(area(c1[:, i], c2[:, i], c3[:, i]) for i in range(4))
    np.testing.assert_allclose(child_total, parent, rtol=1e-4)
    # each child has 1/4 the parent area in midpoint subdivision
    for i in range(4):
        np.testing.assert_allclose(area(c1[:, i], c2[:, i], c3[:, i]), parent / 4,
                                   rtol=1e-4)
    # child 0 keeps corner a; vertex indices: 3 new verts per face
    np.testing.assert_allclose(np.asarray(c1[:, 0]), np.asarray(v1), atol=0)
    assert int(c_vidx.max()) == 100 + 3 * 10 - 1
    # 1->5 keeps a parent copy at child 4
    (c1p, c2p, c3p), _, _ = subdivision.subdivide(v1, v2, v3, vidx, 5, 100)
    np.testing.assert_allclose(np.asarray(c1p[:, 4]), np.asarray(v1), atol=0)
    np.testing.assert_allclose(np.asarray(c3p[:, 4]), np.asarray(v3), atol=0)
    assert np.asarray(new_v).shape == (10, 3, 3)


def test_face_helpers():
    v1 = jnp.asarray([[0.0, 0, 0]])
    v2 = jnp.asarray([[1.0, 0, 0]])
    v3 = jnp.asarray([[0.0, 1, 0]])
    r = subdivision.face_mean_edge_length(v1, v2, v3)
    np.testing.assert_allclose(float(r[0, 0]), (1 + 1 + np.sqrt(2)) / 3, rtol=1e-6)
    n = subdivision.face_normals(v1, v2, v3)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)
