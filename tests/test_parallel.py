"""Multi-chip sharded step vs single-chip equivalence, on the virtual
8-device CPU mesh (SURVEY.md §4 layer 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianmesh_tpu.config import OptimizationParams
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.models import render as render_mod
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from gaussianmesh_tpu.parallel import sharding, train_step as pts
from gaussianmesh_tpu.train import loss as loss_mod
from gaussianmesh_tpu.train import optim as optim_mod
from tests.meshes import icosphere
from tests.scenes import look_at_camera

W = H = 64  # gy = 4 tile rows


@pytest.fixture(scope="module")
def setup():
    v, f = icosphere(1)
    p, b, mv, st = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                        capacity=128, vertex_capacity=512)
    cams = [look_at_camera(W, H, azimuth=a, distance=3.2)
            for a in (0.3, 2.1)]
    rng = np.random.default_rng(0)
    gts = [jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
           for _ in cams]
    return p, b, st, cams, gts


def _cfg():
    return RasterizerConfig(width=W, height=H, max_per_tile=128,
                            use_pallas=False)


def test_sharded_step_matches_single_chip(setup):
    p, b, st, cams, gts = setup
    assert len(jax.devices()) >= 8
    mesh = sharding.make_mesh(2, 4)
    opt = OptimizationParams()
    tx = optim_mod.make_optimizer(optim_mod.mesh_lr_tree_fn(opt, 1.0))
    opt_state = tx.init(p)

    cfg = _cfg()
    lam, mrw = opt.lambda_dssim, opt.alpha_mrloss
    step = pts.make_sharded_train_step(mesh, tx, cfg, sh_degree=0,
                                       lambda_dssim=lam, mr_weight=mrw,
                                       width=W, height_valid=H)
    cam_batch = tuple(jnp.stack([getattr(c, fld) for c in cams])
                      for fld in type(cams[0])._fields)
    gt_batch = jnp.stack(gts)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    p2, opt_state2, st2, metrics = step(p, opt_state, st, b, cam_batch,
                                        gt_batch, bg)

    # single-chip reference loss + grads
    def loss_single(params, off):
        total = 0.0
        for cam, gt in zip(cams, gts):
            arrays = render_mod.mesh_model_arrays(params, b, cam, 0)
            out = render_mod.render(arrays, cam, cfg, bg, mean2d_offset=off)
            total += ((1 - lam) * loss_mod.l1_loss(out.color, gt)
                      + lam * (1 - loss_mod.ssim(out.color, gt)))
        total = total / len(cams)
        total += loss_mod.mesh_restrict_loss(
            mgs.get_scaling(params), b.vertex1, b.vertex2, b.vertex3,
            b.alive, mrw)
        return total

    off0 = jnp.zeros((b.alive.shape[0], 2))
    loss_ref, grads_ref = jax.value_and_grad(loss_single, argnums=(0, 1))(p, off0)
    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref),
                               rtol=1e-4)

    # parameter update equivalence: apply same tx to reference grads
    import optax
    upd_ref, _ = tx.update(grads_ref[0], tx.init(p), p)
    p_ref = optax.apply_updates(p, upd_ref)
    for name in ("bc", "distance", "opacity", "scaling"):
        a = np.asarray(getattr(p2, name))
        r = np.asarray(getattr(p_ref, name))
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(a / scale, r / scale, atol=5e-4,
                                   err_msg=name)

    # densification stats accumulate PER VIEW (norms before the cross-view
    # sum, one visibility count per view — reference
    # train_mesh_gaussian.py:123-124 semantics)
    want = np.zeros(b.alive.shape[0])
    denom_want = np.zeros(b.alive.shape[0])
    for cam, gt in zip(cams, gts):
        def loss_v(off, cam=cam, gt=gt):
            arrays = render_mod.mesh_model_arrays(p, b, cam, 0)
            out = render_mod.render(arrays, cam, cfg, bg, mean2d_offset=off)
            return ((1 - lam) * loss_mod.l1_loss(out.color, gt)
                    + lam * (1 - loss_mod.ssim(out.color, gt)))
        g_v = np.asarray(jax.grad(loss_v)(off0))
        arrays = render_mod.mesh_model_arrays(p, b, cam, 0)
        out_v = render_mod.render(arrays, cam, cfg, bg)
        vis_v = np.asarray(out_v.radii) > 0
        n_v = np.linalg.norm(g_v * np.array([0.5 * W, 0.5 * H]), axis=-1)
        want += np.where(vis_v, n_v, 0.0)
        denom_want += vis_v
    got = np.asarray(st2.grad_accum)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.denom), denom_want, atol=0)


def test_band_clipping_consistency(setup):
    """Rendering 4 bands separately must tile into the full image."""
    p, b, st, cams, _ = setup
    cfg = _cfg()
    cam = cams[0]
    arrays = render_mod.mesh_model_arrays(p, b, cam, 0)
    bg = jnp.zeros(3)
    full = rasterize(arrays.xyz, arrays.cov6, arrays.opacity, arrays.rgb,
                     bg, cam, cfg, active_mask=arrays.active)
    bands = []
    for y0 in range(4):
        out = pts.rasterize_band(arrays, cam, cfg, gy_local=1,
                                 y0_tiles=jnp.int32(y0), bg=bg)
        bands.append(np.asarray(out.color))
    stitched = np.concatenate(bands, axis=1)
    np.testing.assert_allclose(stitched, np.asarray(full.color), atol=2e-5)


@pytest.mark.slow
def test_mesh_trainer_multichip(setup):
    """MeshTrainer with a (2, 4) device mesh trains on the virtual CPU mesh."""
    from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
    from gaussianmesh_tpu.train.trainer import DeviceDataset, MeshTrainer
    from tests.meshes import icosphere

    _, _, _, cams, gts = setup
    cams = cams * 2  # 4 views
    gts = gts * 2
    ds = DeviceDataset(
        view=jnp.stack([c.viewmatrix for c in cams]),
        proj=jnp.stack([c.projmatrix for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tanfovx=jnp.stack([c.tanfovx for c in cams]),
        tanfovy=jnp.stack([c.tanfovy for c in cams]),
        images=jnp.asarray(np.stack([(np.asarray(g) * 255).astype(np.uint8)
                                     for g in gts])),
        masks=None, width=W, height=H)
    v, f = icosphere(1)
    opt = OptimizationParams(densify_from_iter=5, densify_until_iter=25,
                             densification_interval=10,
                             opacity_reset_interval=10_000)
    rt = RuntimeParams(max_per_tile=128, 
                       use_pallas=False, data_axis=2, tile_axis=4)
    tr = MeshTrainer(v, f, ds, opt, rt, spatial_lr_scale=3.2,
                     init_target=100, max_sh_degree=1)
    assert tr.device_mesh is not None
    log = tr.train(iterations=30, log_every=10)
    losses = [m["loss"] for m in log]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.2


def test_sharded_playback_matches_single_chip(tmp_path):
    """Config-5 path: frames over the data axis, tile bands within;
    must reproduce the fused single-chip playback fn exactly."""
    from gaussianmesh_tpu.edit.runtime import SceneEditor, make_playback_fn
    from gaussianmesh_tpu.parallel.edit_step import make_sharded_playback_fn
    from tests.test_edit import _make_object

    ply_path, mesh_path, _, _ = _make_object(tmp_path)
    editor = SceneEditor()
    editor.add_object(ply_path, mesh_path, name="obj")
    cam = look_at_camera(W, H, distance=3.5)
    cfg = _cfg()

    v, f = icosphere(1)
    frames = jnp.asarray(np.stack([
        v * (1.0 + 0.2 * np.sin(i)) for i in range(2)]).astype(np.float32))

    mesh = sharding.make_mesh(2, 4)
    playback = make_sharded_playback_fn(mesh, editor, "obj", cam, cfg)
    imgs = np.asarray(playback(frames))
    assert imgs.shape == (2, 3, H, W)

    frame_fn = make_playback_fn(editor.objects["obj"], cam, cfg)
    for i in range(2):
        want = np.asarray(frame_fn(frames[i]))
        np.testing.assert_allclose(imgs[i], want, atol=1e-5)


def test_gauss_sharded_matches_single_chip():
    """Gaussian-table sharding (pair all-to-all to band owners): pixels
    AND parameter gradients must match the single-chip rasterizer."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from tests.scenes import random_gaussians
    from gaussianmesh_tpu.parallel import gauss_shard
    from gaussianmesh_tpu.models.render import GaussianArrays

    wt, ht = 64, 128            # grid 4 x 8 -> 8 one-tile-row bands
    n = 400
    d_ax = 8
    sc = random_gaussians(n, seed=7)
    cam = look_at_camera(wt, ht, distance=3.5)
    cfg = RasterizerConfig(width=wt, height=ht, max_per_tile=256,
                           use_pallas=False)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:d_ax]), ("shard",))
    n_local = n // d_ax
    send_cap = cfg.expand_capacity(n_local)

    def body(xyz, cov6, op, rgb):
        arrays = GaussianArrays(xyz=xyz, cov6=cov6, opacity=op, rgb=rgb,
                                active=jnp.ones(xyz.shape[0], bool))
        out = gauss_shard.rasterize_band_gauss_sharded(
            arrays, cam, cfg, gy_local=1, axis_name="shard",
            send_capacity=send_cap, bg=bg)
        return out.color, out.send_overflow

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
        out_specs=(P(None, "shard", None), P()),
        check_vma=False))

    args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"])
    img, overflow = fn(*args)
    assert int(overflow) == 0

    ref = rasterize(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"],
                    bg, cam, cfg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.color),
                               atol=1e-5)

    # gradient parity: cotangents route back through the all_to_all
    # transpose and land on the owning shard
    def loss_sharded(op):
        img, _ = fn(args[0], args[1], op, args[3])
        return jnp.sum(img * img)

    def loss_single(op):
        out = rasterize(args[0], args[1], op, args[3], bg, cam, cfg)
        return jnp.sum(out.color * out.color)

    g_sh = np.asarray(jax.grad(loss_sharded)(sc["opacity"]))
    g_si = np.asarray(jax.grad(loss_single)(sc["opacity"]))
    scale = max(np.abs(g_si).max(), 1e-6)
    np.testing.assert_allclose(g_sh / scale, g_si / scale, atol=1e-5)


def test_gauss_sharded_train_step_matches_single_chip(setup):
    """Sharded-table trainer: loss and parameter updates must match the
    single-chip loss differentiated as a whole (cross-band gradient
    terms route back through the all_to_all transpose)."""
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from gaussianmesh_tpu.parallel import gauss_shard

    p, b, st, cams, gts = setup
    d_ax = 4                   # gy = 4 -> one tile row per band
    mesh = Mesh(np.asarray(jax.devices()[:d_ax]), ("shard",))
    opt = OptimizationParams()
    tx = optim_mod.make_optimizer(optim_mod.mesh_lr_tree_fn(opt, 1.0))
    opt_state = tx.init(p)
    cfg = _cfg()
    lam, mrw = opt.lambda_dssim, opt.alpha_mrloss
    n = b.alive.shape[0]
    send_cap = cfg.expand_capacity(n // d_ax)

    step = gauss_shard.make_gauss_sharded_train_step(
        mesh, tx, cfg, sh_degree=0, lambda_dssim=lam, mr_weight=mrw,
        width=W, height_valid=H, send_capacity=send_cap)

    cam, gt = cams[0], gts[0]
    bg = jnp.asarray([0.2, 0.4, 0.6])
    p2, opt_state2, st2, metrics = step(p, opt_state, st, b,
                                        tuple(cam), gt, bg)
    assert int(metrics["tile_overflow"]) == 0

    def loss_single(params, off):
        arrays = render_mod.mesh_model_arrays(params, b, cam, 0)
        out = render_mod.render(arrays, cam, cfg, bg, mean2d_offset=off)
        total = ((1 - lam) * loss_mod.l1_loss(out.color, gt)
                 + lam * (1 - loss_mod.ssim(out.color, gt)))
        total += loss_mod.mesh_restrict_loss(
            mgs.get_scaling(params), b.vertex1, b.vertex2, b.vertex3,
            b.alive, mrw)
        return total

    off0 = jnp.zeros((n, 2))
    loss_ref, grads_ref = jax.value_and_grad(
        loss_single, argnums=(0, 1))(p, off0)
    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref),
                               rtol=1e-4)

    upd_ref, _ = tx.update(grads_ref[0], tx.init(p), p)
    p_ref = optax.apply_updates(p, upd_ref)
    for name in ("bc", "distance", "opacity", "scaling"):
        a = np.asarray(getattr(p2, name))
        r = np.asarray(getattr(p_ref, name))
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(a / scale, r / scale, atol=5e-4,
                                   err_msg=name)


@pytest.mark.slow  # minutes-long virtual-mesh integration run
def test_mesh_trainer_gauss_sharded(setup):
    """MeshTrainer in the Gaussian-table-sharded regime (shard_gaussians=4)
    trains on the virtual CPU mesh."""
    from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
    from gaussianmesh_tpu.train.trainer import DeviceDataset, MeshTrainer
    from tests.meshes import icosphere

    _, _, _, cams, gts = setup
    ds = DeviceDataset(
        view=jnp.stack([c.viewmatrix for c in cams]),
        proj=jnp.stack([c.projmatrix for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tanfovx=jnp.stack([c.tanfovx for c in cams]),
        tanfovy=jnp.stack([c.tanfovy for c in cams]),
        images=jnp.asarray(np.stack([(np.asarray(g) * 255).astype(np.uint8)
                                     for g in gts])),
        masks=None, width=W, height=H)
    v, f = icosphere(1)
    opt = OptimizationParams(densify_from_iter=5, densify_until_iter=25,
                             densification_interval=10,
                             opacity_reset_interval=10_000)
    rt = RuntimeParams(max_per_tile=128, 
                       use_pallas=False, shard_gaussians=4)
    tr = MeshTrainer(v, f, ds, opt, rt, spatial_lr_scale=3.2,
                     init_target=100, max_sh_degree=1)
    assert tr.gauss_mesh is not None
    log = tr.train(iterations=30, log_every=10)
    losses = [m["loss"] for m in log]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.2


@pytest.mark.slow  # minutes-long virtual-mesh integration run
def test_mesh_trainer_gauss_sharded_ckpt_resume(setup, tmp_path):
    """Sharded train -> orbax checkpoint THROUGH a densify event -> fresh
    trainer -> resume -> end state equals the uninterrupted run
    (VERDICT r2 #5: --auto_resume regression in the sharded regime; ref
    semantics train_mesh_gaussian.py:133-135)."""
    from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
    from gaussianmesh_tpu.train.trainer import DeviceDataset, MeshTrainer
    from tests.meshes import icosphere

    _, _, _, cams, gts = setup
    ds = DeviceDataset(
        view=jnp.stack([c.viewmatrix for c in cams]),
        proj=jnp.stack([c.projmatrix for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tanfovx=jnp.stack([c.tanfovx for c in cams]),
        tanfovy=jnp.stack([c.tanfovy for c in cams]),
        images=jnp.asarray(np.stack([(np.asarray(g) * 255).astype(np.uint8)
                                     for g in gts])),
        masks=None, width=W, height=H)
    v, f = icosphere(1)
    opt = OptimizationParams(densify_from_iter=5, densify_until_iter=25,
                             densification_interval=10,
                             opacity_reset_interval=10_000)
    rt = RuntimeParams(max_per_tile=128, use_pallas=False,
                       shard_gaussians=4)

    def make():
        return MeshTrainer(v, f, ds, opt, rt, spatial_lr_scale=3.2,
                           init_target=100, max_sh_degree=1)

    # uninterrupted run: 30 iters (densify fires at 5, 15, 25)
    tr_a = make()
    tr_a.train(iterations=30, log_every=100)

    # interrupted: 16 iters (past the iter-15 densify), ckpt, fresh
    # trainer, resume, finish
    tr_b = make()
    tr_b.train(iterations=16, log_every=100)
    path = tr_b.save_ckpt(str(tmp_path / "chkpnt16.ckpt"))
    assert path.endswith(".orbax")       # sharded regime -> orbax flavor
    tr_c = make()
    tr_c.load_ckpt(str(tmp_path / "chkpnt16.ckpt"))
    assert tr_c.global_it == 16
    tr_c.train(iterations=14, log_every=100)

    assert int(tr_c.binding.alive.sum()) == int(tr_a.binding.alive.sum())
    for name in ("bc", "distance", "opacity", "scaling", "rotation"):
        np.testing.assert_allclose(
            np.asarray(getattr(tr_c.params, name)),
            np.asarray(getattr(tr_a.params, name)), atol=1e-6,
            err_msg=name)


def test_multihost_helpers_single_process():
    from gaussianmesh_tpu.parallel import multihost
    multihost.initialize()          # no env -> no-op
    s, e = multihost.process_camera_slice(10)
    assert (s, e) == (0, 10)


def test_gauss_sharded_send_overflow_reported():
    """All Gaussians landing in ONE band with a tiny send capacity must
    REPORT drops, never silently truncate."""
    from jax.sharding import PartitionSpec as P
    from tests.scenes import random_gaussians
    from gaussianmesh_tpu.parallel import gauss_shard
    from gaussianmesh_tpu.models.render import GaussianArrays

    wt, ht = 64, 128
    n, d_ax = 400, 8
    sc = random_gaussians(n, seed=7)
    cam = look_at_camera(wt, ht, distance=3.5)
    cfg = RasterizerConfig(width=wt, height=ht, max_per_tile=256,
                           use_pallas=False)
    bg = jnp.zeros(3)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:d_ax]), ("shard",))

    def body(xyz, cov6, op, rgb):
        arrays = GaussianArrays(xyz=xyz, cov6=cov6, opacity=op, rgb=rgb,
                                active=jnp.ones(xyz.shape[0], bool))
        out = gauss_shard.rasterize_band_gauss_sharded(
            arrays, cam, cfg, gy_local=1, axis_name="shard",
            send_capacity=8, bg=bg)      # deliberately starved
        return jax.lax.psum(out.send_overflow, "shard")

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
        out_specs=P(), check_vma=False))
    overflow = int(fn(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"]))
    assert overflow > 0                  # starved capacity must be visible


@pytest.mark.slow  # minutes-long virtual-mesh integration run
def test_gauss_sharded_densify_matches_single_table():
    """Per-shard compaction == single-table densify when no per-shard cap
    binds: same n_split, same alive count, same vertex growth, and the
    same MULTISET of children (row placement differs by design)."""
    from jax.sharding import Mesh
    from gaussianmesh_tpu.train import densify as densify_mod
    from gaussianmesh_tpu.train import optim as optim_mod
    from tests.meshes import icosphere

    d_ax = 4
    mesh = Mesh(np.asarray(jax.devices()[:d_ax]), ("shard",))
    v, f = icosphere(1)                      # 80 faces
    p, b, mv, st = mgs.create_from_mesh(jnp.asarray(v), jnp.asarray(f),
                                        capacity=256, vertex_capacity=1024)
    opt = OptimizationParams()
    tx = optim_mod.make_optimizer(optim_mod.mesh_lr_tree_fn(opt, 1.0))
    mu, nu = tx.init(p).adam.mu, tx.init(p).adam.nu
    mu = jax.tree.map(lambda x: x + 0.25, mu)    # nonzero, to see zeroing

    # deal alive rows across shards the way the trainer does, then mark a
    # known subset hot (spread over all shards)
    alive = np.asarray(b.alive)
    order = np.concatenate([np.flatnonzero(alive), np.flatnonzero(~alive)])
    c = alive.shape[0]
    src = np.empty(c, np.int64)
    k = np.arange(c)
    src[(k % d_ax) * (c // d_ax) + k // d_ax] = order
    take = lambda x: x[jnp.asarray(src)] if x.ndim > 0 and x.shape[0] == c else x
    p = jax.tree.map(take, p)
    b = jax.tree.map(take, b)
    mu = jax.tree.map(take, mu)
    nu = jax.tree.map(take, nu)

    rng = np.random.default_rng(5)
    hot_rows = rng.choice(np.flatnonzero(np.asarray(b.alive)), size=12,
                          replace=False)
    grads = np.zeros(c, np.float32)
    grads[hot_rows] = rng.uniform(1.0, 2.0, 12)
    grads = jnp.asarray(grads)

    res_g = densify_mod.densify_and_split(
        p, b, mv, mu, nu, st, grads, 0.5, 5, max_split=64)
    res_s = densify_mod.densify_and_split_gauss_sharded(
        mesh, p, b, mv, mu, nu, st, grads, 0.5, 5, max_split_per_shard=64)

    assert int(res_g.dropped) == 0 and int(res_s.dropped) == 0
    assert int(res_s.n_split) == int(res_g.n_split) == 12
    assert int(res_s.binding.alive.sum()) == int(res_g.binding.alive.sum())
    assert int(res_s.mesh_v.count) == int(res_g.mesh_v.count)

    def content(res):
        """Sorted multiset of alive rows' (xyz, scaling, vertex coords)."""
        al = np.asarray(res.binding.alive)
        xyz = np.asarray(mgs.get_xyz(res.params, res.binding))[al]
        sc = np.asarray(res.params.scaling)[al]
        vs = np.stack([np.asarray(res.binding.vertex1)[al],
                       np.asarray(res.binding.vertex2)[al],
                       np.asarray(res.binding.vertex3)[al]], axis=1)
        rows = np.concatenate([xyz, sc, vs.reshape(-1, 9)], axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_allclose(content(res_s), content(res_g), atol=1e-6)

    # new-vertex POOL content matches as a multiset (append order differs)
    def new_verts(res):
        lo, hi = int(mv.count), int(res.mesh_v.count)
        arr = np.asarray(res.mesh_v.v)[lo:hi]
        return arr[np.lexsort(arr.T[::-1])]

    np.testing.assert_allclose(new_verts(res_s), new_verts(res_g), atol=1e-6)

    # Adam moments zeroed at every child slot (fresh rows start clean)
    child_rows = np.asarray(res_s.binding.alive) & ~np.asarray(b.alive)
    assert np.all(np.asarray(res_s.mu.bc)[child_rows] == 0.0)

    # vertex_index stays globally consistent: every alive row's vertex
    # coords must equal the pool entries its indices point to
    vi = np.asarray(res_s.binding.vertex_index)
    al = np.asarray(res_s.binding.alive)
    pool = np.asarray(res_s.mesh_v.v)
    orig_v = np.asarray(v)
    # (rows created at init reference the ORIGINAL mesh vertices, which
    # occupy the pool prefix)
    np.testing.assert_allclose(pool[: orig_v.shape[0]], orig_v, atol=0)
    v1 = pool[vi[al, 0]]
    np.testing.assert_allclose(v1, np.asarray(res_s.binding.vertex1)[al],
                               atol=1e-6)


def test_gauss_shard_emulation_d1_matches_single_chip():
    """The scaling harness's _emulate_d hook (identity collectives): at
    D=1 the emulated band step IS the real single-device step, so its
    image must match the plain rasterizer."""
    from tests.scenes import random_gaussians
    from gaussianmesh_tpu.parallel import gauss_shard
    from gaussianmesh_tpu.models.render import GaussianArrays

    wt, ht = 64, 64
    n = 300
    sc = random_gaussians(n, seed=9)
    cam = look_at_camera(wt, ht, distance=3.5)
    cfg = RasterizerConfig(width=wt, height=ht, max_per_tile=256,
                           use_pallas=False)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    arrays = GaussianArrays(xyz=sc["means3d"], cov6=sc["cov6"],
                            opacity=sc["opacity"].reshape(-1),
                            rgb=sc["rgb"], active=jnp.ones(n, bool))
    out = gauss_shard.rasterize_band_gauss_sharded(
        arrays, cam, cfg, gy_local=cfg.grid[1], axis_name="unused",
        send_capacity=cfg.expand_capacity(n), bg=bg,
        _emulate_d=1, _emulate_idx=0)
    ref = rasterize(sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"],
                    bg, cam, cfg)
    assert int(out.send_overflow) == 0
    np.testing.assert_allclose(np.asarray(out.color),
                               np.asarray(ref.color), atol=3e-5)
