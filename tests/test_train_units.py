import jax
import jax.numpy as jnp
import numpy as np

from gaussianmesh_tpu.config import OptimizationParams
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.train import densify, loss, optim
from tests.meshes import icosphere


def _make(capacity=512, vcap=2048):
    v, f = icosphere(0)  # 20 faces, 12 verts
    return mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                capacity=capacity, vertex_capacity=vcap)


def test_ssim_perfect_and_degraded():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    assert float(loss.ssim(img, img)) > 0.999
    noisy = img + 0.3 * jnp.asarray(rng.normal(size=(3, 32, 32)).astype(np.float32))
    assert float(loss.ssim(img, noisy)) < 0.9


def test_mesh_restrict_loss_zero_when_small():
    v1 = jnp.asarray([[0.0, 0, 0]])
    v2 = jnp.asarray([[1.0, 0, 0]])
    v3 = jnp.asarray([[0.0, 1, 0]])
    alive = jnp.asarray([True])
    small = jnp.asarray([[0.01, 0.01, 0.01]])
    assert float(loss.mesh_restrict_loss(small, v1, v2, v3, alive)) == 0.0
    big = jnp.asarray([[100.0, 0.01, 0.01]])
    # r = sqrt(||ABxAC||) = sqrt(1) = 1 -> loss = 100 - 6*1
    np.testing.assert_allclose(float(loss.mesh_restrict_loss(big, v1, v2, v3, alive)),
                               94.0, rtol=1e-5)


def test_optimizer_moves_params_with_scheduled_lr():
    p, b, mv, st = _make()
    opt = OptimizationParams()
    tx = optim.make_optimizer(optim.mesh_lr_tree_fn(opt, spatial_lr_scale=2.0))
    ost = tx.init(p)
    g = jax.tree.map(jnp.ones_like, p)
    upd, ost = tx.update(g, ost, p)
    # lr magnitudes: bc step ~ position_lr_init*2 (after adam normalization ~1)
    assert abs(float(upd.bc[0, 0])) > 0
    assert float(ost.step) == 1
    # scheduled lr decays
    lrs0 = optim.mesh_lr_tree_fn(opt, 2.0)(jnp.int32(1))
    lrs1 = optim.mesh_lr_tree_fn(opt, 2.0)(jnp.int32(30_000))
    assert float(lrs1.bc) < float(lrs0.bc)
    np.testing.assert_allclose(float(lrs1.bc), opt.position_lr_final * 2.0,
                               rtol=1e-3)


def test_densify_split_geometry_and_bookkeeping():
    p, b, mv, st = _make()
    mu = jax.tree.map(jnp.zeros_like, p)
    nu = jax.tree.map(jnp.zeros_like, p)
    n0 = int(b.alive.sum())
    v_count0 = int(mv.count)

    grads = jnp.where(jnp.arange(b.alive.shape[0]) < 5, 1.0, 0.0)  # split 5
    res = densify.densify_and_split(p, b, mv, mu, nu, st, grads, 0.5,
                                    n_children=5, max_split=16)
    assert int(res.n_split) == 5
    assert int(res.dropped) == 0
    # net +4 per split (5 children, parent retired)
    assert int(res.binding.alive.sum()) == n0 + 4 * 5
    assert int(res.mesh_v.count) == v_count0 + 3 * 5

    # children of parent 0: areas must be (1/4, 1/4, 1/4, 1/4, 1) of parent
    pa = np.asarray
    def area(i, bnd):
        ab = pa(bnd.vertex2)[i] - pa(bnd.vertex1)[i]
        ac = pa(bnd.vertex3)[i] - pa(bnd.vertex1)[i]
        return 0.5 * np.linalg.norm(np.cross(ab, ac))

    parent_area = area(0, b)
    # children of parent 0 = alive rows with fid == 0 (parent slot may be
    # recycled as a child destination; the parent row itself was retired)
    fid0 = (pa(res.binding.fid)[:, 0] == 0) & pa(res.binding.alive)
    child_ids = np.nonzero(fid0)[0].tolist()
    assert len(child_ids) == 5
    areas = sorted(area(i, res.binding) for i in child_ids)
    np.testing.assert_allclose(areas, [parent_area / 4] * 4 + [parent_area],
                               rtol=1e-4)
    # child scale shrunk by log(3.2)
    some_child = child_ids[0]
    np.testing.assert_allclose(
        pa(res.params.scaling)[some_child],
        pa(p.scaling)[0] - float(densify.LOG_SCALE_SHRINK), rtol=1e-5)
    # stats reset
    assert float(res.state.grad_accum.sum()) == 0.0


def test_densify_capacity_exhaustion_reported():
    p, b, mv, st = _make(capacity=24)  # 20 alive, only 4 free
    mu = jax.tree.map(jnp.zeros_like, p)
    nu = jax.tree.map(jnp.zeros_like, p)
    grads = jnp.ones(24)
    res = densify.densify_and_split(p, b, mv, mu, nu, st, grads, 0.5,
                                    n_children=5, max_split=8)
    # each split frees its parent slot: room for exactly 1 split (4 free + 1)
    assert int(res.n_split) >= 1
    assert int(res.dropped) >= 1
    assert int(res.n_split + res.dropped) == 8


def test_split_all_for_init_quadruples():
    p, b, mv, st = _make(capacity=256)
    mu = jax.tree.map(jnp.zeros_like, p)
    nu = jax.tree.map(jnp.zeros_like, p)
    res = densify.split_all_for_init(p, b, mv, mu, nu, st, max_split=32)
    assert int(res.n_split) == 20
    assert int(res.binding.alive.sum()) == 80  # 1->4, parent replaced


def test_reset_opacity():
    p, _, _, _ = _make()
    p = p.replace(opacity=jnp.full_like(p.opacity, 3.0))  # sigmoid ~ 0.95
    p2 = densify.reset_opacity(p)
    assert float(jax.nn.sigmoid(p2.opacity).max()) <= 0.0101
