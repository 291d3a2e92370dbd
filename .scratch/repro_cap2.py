import numpy as np, jax, jax.numpy as jnp
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from tests.scenes import look_at_camera, random_gaussians

W = H = 32
cam = look_at_camera(W, H)
sc = random_gaussians(30, seed=4)
BG = jnp.asarray([0.15, 0.25, 0.35])
cfg_kw = dict(width=W, height=H, max_per_tile=128, blend_chunk=128)

def run(opac_val):
    op = jnp.full_like(sc["opacity"], opac_val)
    def loss(op, rgb, use_pallas):
        cfg = RasterizerConfig(use_pallas=use_pallas, **cfg_kw)
        out = rasterize(sc["means3d"], sc["cov6"], op, rgb, BG, cam, cfg)
        return jnp.sum(out.color**2) + 0.1*jnp.sum(out.final_t)
    g_j = jax.jit(jax.grad(loss, argnums=(0,1)), static_argnums=2)(op, sc["rgb"], False)
    g_p = jax.jit(jax.grad(loss, argnums=(0,1)), static_argnums=2)(op, sc["rgb"], True)
    # also forward parity
    fj = jax.jit(loss, static_argnums=2)(op, sc["rgb"], False)
    fp = jax.jit(loss, static_argnums=2)(op, sc["rgb"], True)
    print(f"op={opac_val}: fwd jnp={float(fj):.6f} pallas={float(fp):.6f}")
    for gp, gj, name in zip(g_p, g_j, ["op","rgb"]):
        gp, gj = np.asarray(gp), np.asarray(gj)
        scale = np.abs(gj).max() + 1e-8
        print(f"  {name} rel err {np.abs(gp-gj).max()/scale:.4e} (scale {scale:.3e})")

run(0.60)    # below cap: should match
run(0.9995)  # above cap at centers: exposes capped-alpha handling
