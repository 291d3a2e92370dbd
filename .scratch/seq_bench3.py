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
import os
cfg = RasterizerConfig(width=W, height=H, max_per_tile=1024,
                       blend_chunk=int(os.environ.get("CHUNK", 128)),
                       pair_capacity_per_gaussian=int(os.environ.get("PCG", 8)),
                       row_capacity_per_gaussian=int(os.environ.get("RCG", 3)))
frame_fn = make_playback_fn(obj, cam, cfg)

@jax.jit
def seq_sum(frames):
    def body(c, vfr):
        img = frame_fn(vfr + c * 1e-30)
        return img.mean() * 1e-20, None
    out, _ = jax.lax.scan(body, 0.0, frames)
    return out

val = float(seq_sum(frames))  # compile + warm
t0 = time.perf_counter(); val = float(seq_sum(frames))
dt = (time.perf_counter() - t0 - 0.03) / frames.shape[0]
print(f"chunk={cfg.blend_chunk} pcg={cfg.pair_capacity_per_gaussian} rcg={cfg.row_capacity_per_gaussian}: {dt*1e3:.1f} ms -> {1/dt:.1f} fps", flush=True)
