"""Background-model training — the train_bg_gaussian.py equivalent.

Phase 2 of the pipeline (reference train_bg_gaussian.py:43-155): with the
trained mesh-bound foreground FROZEN, train a vanilla 3DGS background
model initialized from the SfM points. Per iteration: random camera,
random background color (opt.random_background), composite render with
the frozen foreground concatenated (stop_grad — bg Gaussians first so the
visibility slice is a prefix), plain L1+SSIM loss (no mask, no
mesh-restrict), Adam with the same schedules, clone/split/prune
densification every 500 iters, opacity reset every 3000, and bg Gaussians
within sqrt(0.01) of any mesh Gaussian pruned at the
`remove_neighbor_iterations` (default {1000, 10000}).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaussianmesh_tpu.config import OptimizationParams, RuntimeParams
from gaussianmesh_tpu.models import gaussians as gs
from gaussianmesh_tpu.models import mesh_gaussians as mgs
from gaussianmesh_tpu.models import render as render_mod
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.train import densify as densify_mod
from gaussianmesh_tpu.train import loss as loss_mod
from gaussianmesh_tpu.train import optim as optim_mod
from gaussianmesh_tpu.train.trainer import DeviceDataset, _round_up, pad_axis0


class BgTrainer:
    def __init__(self, fg_params: mgs.MeshGaussianParams,
                 fg_binding: mgs.MeshBinding, points: np.ndarray,
                 colors: np.ndarray, dataset: DeviceDataset,
                 opt: OptimizationParams, rt: RuntimeParams,
                 spatial_lr_scale: float, white_background: bool = True,
                 max_sh_degree: int = 3,
                 remove_neighbor_iterations=(1000, 10_000)):
        self.opt = opt
        self.rt = rt
        self.ds = dataset
        self.max_sh_degree = max_sh_degree
        self.spatial_lr_scale = spatial_lr_scale
        self.extent = spatial_lr_scale
        self.white_background = white_background
        self.bg_const = jnp.ones(3) if white_background else jnp.zeros(3)
        self.remove_neighbor_iterations = set(remove_neighbor_iterations)
        self.key = jax.random.PRNGKey(rt.seed)

        # frozen foreground
        self.fg_params = jax.tree.map(jax.lax.stop_gradient, fg_params)
        self.fg_binding = fg_binding
        self.fg_xyz = mgs.get_xyz(self.fg_params, fg_binding)

        cap = (rt.capacity or _round_up(max(points.shape[0] * 4, 65536), 4096))
        self.params, self.state = gs.create_from_points(
            jnp.asarray(points), jnp.asarray(colors), capacity=cap,
            max_sh_degree=max_sh_degree)
        self.tx = optim_mod.make_optimizer(
            optim_mod.gaussian_lr_tree_fn(opt, spatial_lr_scale))
        self.opt_state = self.tx.init(self.params)
        self.sh_degree = 0
        self.global_it = 0   # persistent across train() segments + resume
        self._step_fns = {}
        self.metrics_log: list[dict] = []
        self.logger = None

    def _raster_cfg(self):
        return RasterizerConfig(
            width=self.ds.width, height=self.ds.height,
            max_per_tile=self.rt.max_per_tile,
            pair_capacity_per_gaussian=self.rt.pair_capacity_per_gaussian,
            row_capacity_per_gaussian=self.rt.row_capacity_per_gaussian,
            blend_chunk=self.rt.blend_chunk,
            use_pallas=self.rt.use_pallas and jax.default_backend() == "tpu")

    def _get_step_fn(self, sh_degree: int, capacity: int):
        key = (sh_degree, capacity)
        if key in self._step_fns:
            return self._step_fns[key]
        cfg = self._raster_cfg()
        tx = self.tx
        ds = self.ds
        lam = self.opt.lambda_dssim
        fg_params, fg_binding = self.fg_params, self.fg_binding
        fg_sh = self.max_sh_degree

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, state, cam_idx, bg):
            cam = ds.camera(cam_idx)
            gt = ds.images[cam_idx].astype(jnp.float32) / 255.0

            def loss_fn(p, m2d_off):
                bg_arrays = render_mod.gaussian_model_arrays(
                    p, state.alive, cam, sh_degree)
                fg_arrays = render_mod.freeze(render_mod.mesh_model_arrays(
                    fg_params, fg_binding, cam, fg_sh))
                arrays = render_mod.concat_arrays(bg_arrays, fg_arrays)
                out = render_mod.render(arrays, cam, cfg, bg,
                                        mean2d_offset=m2d_off)
                l1 = loss_mod.l1_loss(out.color, gt)
                ssim_v = loss_mod.ssim(out.color, gt)
                total = (1 - lam) * l1 + lam * (1 - ssim_v)
                return total, (out, l1, ssim_v)

            n_total = capacity + fg_binding.alive.shape[0]
            m2d_zero = jnp.zeros((n_total, 2))
            (total, (out, l1, ssim_v)), (g_params, g_off) = (
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    params, m2d_zero))

            updates, opt_state = tx.update(g_params, opt_state, params)
            params = optax.apply_updates(params, updates)

            vis_bg = out.visibility[:capacity]
            state = state.replace(
                grad_accum=state.grad_accum + jnp.where(
                    vis_bg,
                    jnp.linalg.norm(g_off[:capacity] * jnp.array(
                        [0.5 * ds.width, 0.5 * ds.height]), axis=-1),
                    0.0),
                denom=state.denom + vis_bg.astype(jnp.float32),
                max_radii2d=jnp.where(
                    vis_bg,
                    jnp.maximum(state.max_radii2d,
                                out.radii[:capacity].astype(jnp.float32)),
                    state.max_radii2d))
            metrics = {"loss": total, "l1": l1, "ssim": ssim_v,
                       "tile_overflow": out.tile_overflow}
            return params, opt_state, state, metrics

        self._step_fns[key] = step
        return step

    def densify(self):
        self.key, k = jax.random.split(self.key)
        max_new = _round_up(max(256, int(self.state.alive.shape[0]) // 16), 256)
        for _attempt in range(4):
            # recompute from CURRENT buffers — after a grow, stale grads
            # and moments would shape-clash against the new capacity
            grads = jnp.nan_to_num(
                self.state.grad_accum / jnp.maximum(self.state.denom, 1.0))
            mu, nu = self.opt_state.adam.mu, self.opt_state.adam.nu
            res = densify_mod.densify_and_prune_bg(
                self.params, self.state, mu, nu, grads, k,
                self.opt.densify_grad_threshold, 0.005, self.extent,
                self.opt.percent_dense, -1.0, max_new)
            if int(res.dropped) == 0:
                break
            self._grow(int(self.state.alive.shape[0] * 3 // 2))
        else:
            raise RuntimeError(
                f"bg densify could not fit {int(res.dropped)} new "
                f"gaussians after 4 capacity grows")
        self.params, self.state = res.params, res.state
        adam = self.opt_state.adam._replace(mu=res.mu, nu=res.nu)
        self.opt_state = self.opt_state._replace(adam=adam)

    def _grow(self, new_cap: int):
        new_cap = _round_up(new_cap, 4096)
        self.params = pad_axis0(self.params, new_cap)
        self.state = pad_axis0(self.state, new_cap)
        adam = self.opt_state.adam._replace(
            mu=pad_axis0(self.opt_state.adam.mu, new_cap),
            nu=pad_axis0(self.opt_state.adam.nu, new_cap))
        self.opt_state = self.opt_state._replace(adam=adam)
        self._step_fns.clear()

    def train(self, iterations: int | None = None, log_every: int = 50,
              callback=None):
        opt = self.opt
        iterations = iterations or opt.iterations
        n_cams = self.ds.images.shape[0]
        densify_interval = 500  # train_bg_gaussian.py:144 (forced)
        t0 = time.time()

        for step_i in range(iterations):
            # schedules key off the GLOBAL iteration (cli/train_bg calls
            # train() in segments between save/test boundaries)
            self.global_it += 1
            it = self.global_it
            if it % 1000 == 0 and self.sh_degree < self.max_sh_degree:
                self.sh_degree += 1
            self.key, k_cam, k_bg = jax.random.split(self.key, 3)
            cam_idx = jax.random.randint(k_cam, (), 0, n_cams)
            bg = (jax.random.uniform(k_bg, (3,)) if opt.random_background
                  else self.bg_const)

            step = self._get_step_fn(self.sh_degree,
                                     int(self.state.alive.shape[0]))
            self.params, self.opt_state, self.state, metrics = step(
                self.params, self.opt_state, self.state, cam_idx, bg)

            if it in self.remove_neighbor_iterations:
                self.state = self.state.replace(
                    alive=densify_mod.prune_near_mesh(
                        self.state.alive, self.params.xyz, self.fg_xyz,
                        self.fg_binding.alive))
            if it < opt.densify_until_iter and it > opt.densify_from_iter \
                    and it % densify_interval == 0:
                self.densify()
            # reset only inside the densify window (the reference nests
            # it under `iteration < densify_until_iter`,
            # train_bg_gaussian.py:139-152 — same bug class as the mesh
            # trainer's round-5 protocol finding)
            if (it < opt.densify_until_iter
                    and (it % opt.opacity_reset_interval == 0
                         or (self.white_background
                             and it == opt.densify_from_iter))):
                self.params = densify_mod.reset_opacity_bg(self.params)
                adam = self.opt_state.adam._replace(
                    mu=self.opt_state.adam.mu.replace(
                        opacity=jnp.zeros_like(self.opt_state.adam.mu.opacity)),
                    nu=self.opt_state.adam.nu.replace(
                        opacity=jnp.zeros_like(self.opt_state.adam.nu.opacity)))
                self.opt_state = self.opt_state._replace(adam=adam)

            if it % log_every == 0 or step_i == iterations - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(iter=it, n_alive=int(self.state.alive.sum()),
                         elapsed=time.time() - t0)
                self.metrics_log.append(m)
                if self.logger is not None:
                    self.logger.scalars(it, {f"train_bg/{k}": v for k, v in
                                             m.items() if k != "iter"})
                if callback:
                    callback(m)
        return self.metrics_log

    def render_view(self, cam, bg=None):
        cfg = self._raster_cfg()
        bg_arrays = render_mod.gaussian_model_arrays(
            self.params, self.state.alive, cam, self.sh_degree)
        fg_arrays = render_mod.mesh_model_arrays(
            self.fg_params, self.fg_binding, cam, self.max_sh_degree)
        arrays = render_mod.concat_arrays(bg_arrays, fg_arrays)
        return render_mod.render(arrays, cam, cfg,
                                 self.bg_const if bg is None else bg)

    def save(self, out_dir: str) -> None:
        import os
        from gaussianmesh_tpu.io import gaussian_ply
        os.makedirs(out_dir, exist_ok=True)
        gaussian_ply.save_gaussian_ply(
            os.path.join(out_dir, "bg_point_cloud.ply"), self.params,
            self.state.alive)

    def capture(self):
        return dict(params=self.params, state=self.state,
                    opt_state=self.opt_state, sh_degree=self.sh_degree,
                    key=self.key, global_it=jnp.int32(self.global_it))

    def restore(self, tree) -> None:
        self.params = tree["params"]
        self.state = tree["state"]
        self.opt_state = tree["opt_state"]
        self.sh_degree = int(tree["sh_degree"])
        self.key = tree["key"]
        self.global_it = int(tree.get("global_it", 0))
        self._step_fns.clear()
