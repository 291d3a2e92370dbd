import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from gaussianmesh_tpu.edit.runtime import SceneEditor, make_playback_fn
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from tests.scenes import look_at_camera
from tests.meshes import icosphere

W, H = 1920, 1080
editor = SceneEditor()
obj = editor.add_object("/tmp/gm_tpu_run/assets/obj.ply", "/tmp/gm_tpu_run/assets/mesh.obj", name="obj")
cam = look_at_camera(W, H, distance=3.2)
v, f = icosphere(5)
frames = jnp.asarray(np.stack([v * (1.0 + 0.15*np.sin(i/16*2*np.pi)) for i in range(16)]).astype(np.float32))

# measure live counts with generous caps
from gaussianmesh_tpu.ops import preprocess as prep_mod, binning
from gaussianmesh_tpu.edit.deform import deformation_gradients
from gaussianmesh_tpu.edit.runtime import transfer_deformation
d = obj.deformer
rot, shear = deformation_gradients(d.v_ref, frames[4], d.neighbors, d.mask)
pos, cov, _ = transfer_deformation(d.v_ref, frames[4], obj.gaussian_tris, obj.weights, obj.pos0, obj.cov0) if False else transfer_deformation(d.v_ref, frames[4], rot, shear, obj.gaussian_tris, obj.weights, obj.pos0, obj.cov0)
from gaussianmesh_tpu.utils import maths
prep = prep_mod.preprocess(pos, maths.strip_symmetric(cov), cam, W, H, opacity=obj.opacity)
gx, gy = prep_mod.tile_grid(W, H)
tl = binning.build_tile_lists(jax.tree.map(jax.lax.stop_gradient, prep), gx, gy,
                              1024, expand_capacity=obj.n*24, pair_capacity=obj.n*24,
                              chunk=128, opacity=obj.opacity, row_capacity=obj.n*8)
rows_used = int(jnp.sum(jnp.where(prep.valid, (prep.rect_max[:,1]-prep.rect_min[:,1]), 0)))
print("n", obj.n, "num_rendered", int(tl.num_rendered), "rows", rows_used,
      "pairs/g", int(tl.num_rendered)/obj.n, "rows/g", rows_used/obj.n,
      "overflow", int(tl.tile_overflow), int(tl.rect_overflow), int(tl.pair_overflow))
