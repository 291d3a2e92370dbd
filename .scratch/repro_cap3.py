import numpy as np, jax, jax.numpy as jnp
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from tests.scenes import look_at_camera, random_gaussians

W = H = 32
cam = look_at_camera(W, H)
sc = random_gaussians(20, seed=4, scale_range=(0.3, 0.6))  # WIDE splats
BG = jnp.asarray([0.15, 0.25, 0.35])
cfg_kw = dict(width=W, height=H, max_per_tile=256, blend_chunk=128)
op = jnp.full_like(sc["opacity"], 0.9999)

def loss(op, rgb, use_pallas):
    cfg = RasterizerConfig(use_pallas=use_pallas, **cfg_kw)
    out = rasterize(sc["means3d"], sc["cov6"], op, rgb, BG, cam, cfg)
    return jnp.sum(out.color**2) + 0.1*jnp.sum(out.final_t)

fj = float(jax.jit(loss, static_argnums=2)(op, sc["rgb"], False))
fp = float(jax.jit(loss, static_argnums=2)(op, sc["rgb"], True))
print("fwd jnp", fj, "pallas", fp)
g_j = jax.jit(jax.grad(loss, argnums=(0,1)), static_argnums=2)(op, sc["rgb"], False)
g_p = jax.jit(jax.grad(loss, argnums=(0,1)), static_argnums=2)(op, sc["rgb"], True)
for gp, gj, name in zip(g_p, g_j, ["op","rgb"]):
    gp, gj = np.asarray(gp), np.asarray(gj)
    scale = np.abs(gj).max() + 1e-8
    print(name, "rel err", np.abs(gp-gj).max()/scale, "(scale %.3e)" % scale)
