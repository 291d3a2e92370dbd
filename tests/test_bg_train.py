"""Background model: vanilla densify compaction + composite bg training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
from gaussianmesh_tpu.models import gaussians as gs
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.train import densify
from gaussianmesh_tpu.train.bg_trainer import BgTrainer
from gaussianmesh_tpu.train.trainer import DeviceDataset
from tests.meshes import icosphere
from tests.scenes import look_at_camera

W = H = 64


def _bg_model(n=60, cap=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 2)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return gs.create_from_points(pts, cols, capacity=cap)


def test_bg_densify_clone_split_prune():
    p, st = _bg_model()
    mu = jax.tree.map(jnp.zeros_like, p)
    nu = jax.tree.map(jnp.zeros_like, p)
    n0 = int(st.alive.sum())
    # large scale for first 5 (-> split), small for next 5 (-> clone)
    scaling = p.scaling
    scaling = scaling.at[:5].set(jnp.log(1.0))
    scaling = scaling.at[5:10].set(jnp.log(0.001))
    p = p.replace(scaling=scaling)
    grads = jnp.where(jnp.arange(256) < 10, 1.0, 0.0)
    key = jax.random.PRNGKey(0)
    res = densify.densify_and_prune_bg(p, st, mu, nu, grads, key,
                                       grad_threshold=0.5, min_opacity=0.005,
                                       extent=1.0, percent_dense=0.01,
                                       max_screen=-1.0, max_new=64)
    assert int(res.n_cloned) == 5
    assert int(res.n_split) == 5
    # net: +5 clones, +2*5 split children -5 parents = +10
    assert int(res.state.alive.sum()) == n0 + 5 + 5
    # split children have shrunk scale
    assert int(res.dropped) == 0

    # opacity prune
    p2 = res.params.replace(opacity=jnp.full_like(res.params.opacity, -10.0))
    res2 = densify.densify_and_prune_bg(p2, res.state, res.mu, res.nu,
                                        jnp.zeros(256), key, 0.5, 0.005,
                                        1.0, 0.01, -1.0, 64)
    assert int(res2.state.alive.sum()) == 0
    assert int(res2.n_pruned) == int(res.state.alive.sum())


def test_prune_near_mesh():
    bg_xyz = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [0.05, 0, 0]])
    mesh_xyz = jnp.asarray([[0.0, 0, 0], [5.0, 5, 5]])
    alive = jnp.asarray([True, True, True])
    mesh_alive = jnp.asarray([True, True])
    out = densify.prune_near_mesh(alive, bg_xyz, mesh_xyz, mesh_alive,
                                  min_dist_sq=0.01)
    np.testing.assert_array_equal(np.asarray(out), [False, True, False])


@pytest.mark.slow
def test_bg_training_composite(tmp_path):
    # frozen fg: colored sphere; bg: random cloud fitting a noisy background
    v, f = icosphere(1)
    fg_p, fg_b, _, _ = mgs.create_from_mesh(
        jnp.asarray(v), jnp.asarray(f), capacity=128, vertex_capacity=512)
    fg_p = fg_p.replace(opacity=jnp.full_like(fg_p.opacity, 4.0))

    cams = [look_at_camera(W, H, azimuth=a, distance=3.5) for a in
            (0.0, 1.5, 3.0, 4.5)]
    rng = np.random.default_rng(1)
    gts = np.stack([rng.uniform(0.3, 0.7, (3, H, W)).astype(np.float32)
                    for _ in cams])
    ds = DeviceDataset(
        view=jnp.stack([c.viewmatrix for c in cams]),
        proj=jnp.stack([c.projmatrix for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tanfovx=jnp.stack([c.tanfovx for c in cams]),
        tanfovy=jnp.stack([c.tanfovy for c in cams]),
        images=jnp.asarray((gts * 255).astype(np.uint8)),
        masks=None, width=W, height=H)

    pts = rng.normal(size=(100, 3)).astype(np.float32) * 2.5
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    opt = OptimizationParams(densify_from_iter=20, densify_until_iter=80,
                             opacity_reset_interval=10_000)
    rt = RuntimeParams(max_per_tile=128, 
                       use_pallas=False, capacity=512)
    tr = BgTrainer(fg_p, fg_b, pts, cols, ds, opt, rt, spatial_lr_scale=3.0,
                   remove_neighbor_iterations=(30,))
    log = tr.train(iterations=120, log_every=40)
    assert np.isfinite([m["loss"] for m in log]).all()
    assert log[-1]["loss"] < log[0]["loss"] * 1.5  # trains without blowup
    out = tr.render_view(cams[0])
    assert np.isfinite(np.asarray(out.color)).all()
