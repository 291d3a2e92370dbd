import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
from gaussianmesh_tpu.ops import preprocess as prep_mod, binning
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from scenes import look_at_camera, random_gaussians

W,H,N = 1920,1080,100_000
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024, blend_chunk=256)
cam = look_at_camera(W,H,distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004,0.02))
gx,gy = cfg.grid
prep = prep_mod.preprocess(sc["means3d"], sc["cov6"], cam, W, H, opacity=sc["opacity"])
# total rows and pairs
rmin, rmax = prep.rect_min, prep.rect_max
heights = jnp.where(prep.valid, rmax[:,1]-rmin[:,1], 0)
widths_bbox = jnp.where(prep.valid, rmax[:,0]-rmin[:,0], 0)
print("total rows:", int(jnp.sum(heights)), "= %.2f/gauss" % (float(jnp.sum(heights))/N))
print("bbox pairs:", int(jnp.sum(heights*widths_bbox)))
tiles = binning.build_tile_lists(prep, gx, gy, 1024,
    expand_capacity=cfg.expand_capacity(N), pair_capacity=cfg.pair_capacity(N),
    chunk=256, opacity=sc["opacity"], row_capacity=cfg.row_capacity(N))
print("live pairs (post-cull):", int(tiles.num_rendered))
aligned_total = int(tiles.aligned_starts[-1])
print("aligned total:", aligned_total, " p_cap:", cfg.pair_capacity(N),
      " e_cap:", cfg.expand_capacity(N), " r_cap:", cfg.row_capacity(N))
print("overflows:", int(tiles.tile_overflow), int(tiles.rect_overflow), int(tiles.pair_overflow))
