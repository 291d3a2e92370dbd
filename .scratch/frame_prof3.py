import sys, time, functools
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from gaussianmesh_tpu.edit.runtime import SceneEditor, transfer_deformation9
from gaussianmesh_tpu.edit.deform import deformation_gradients9
from gaussianmesh_tpu.ops.rasterize import RasterizerConfig
from gaussianmesh_tpu.ops import preprocess as prep_mod, binning, tile_blend
from gaussianmesh_tpu.utils import maths, sh as sh_utils
from tests.scenes import look_at_camera
from tests.meshes import icosphere

W, H = 1920, 1080
editor = SceneEditor()
obj = editor.add_object("/tmp/gm_tpu_run/assets/obj.ply", "/tmp/gm_tpu_run/assets/mesh.obj", name="obj")
cam = look_at_camera(W, H, distance=3.2)
v, f = icosphere(5)
vdef = jnp.asarray(v*1.1, jnp.float32)
d = obj.deformer
N = obj.n
gx, gy = prep_mod.tile_grid(W, H)
NT = gx*gy
CHUNK = 128
PCG, RCG = 8, 3
m_cap, r_cap = N*PCG, N*RCG
p_cap = -(-(N*PCG + NT*(CHUNK//2))//CHUNK)*CHUNK

def bench(fn, *args, steps=20):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps): o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/steps*1e3

# phase A: deform + transfer + SH
def phaseA(vdef):
    rot9, shear9 = deformation_gradients9(d.v_ref, vdef, d.neighbors, d.mask)
    pos, cov6, r_hat = transfer_deformation9(d.v_ref, vdef, rot9, shear9,
        obj.gaussian_tris, obj.weights, obj.pos0, obj.cov6_0)
    dirs = pos - cam.campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    rx, ry, rz = maths.m9_vec(maths.m9_t(maths.m9_from_packed(r_hat)),
                              dirs[:, 0], dirs[:, 1], dirs[:, 2])
    d_rot = jnp.stack([rx, ry, rz], axis=-1)
    rgb = jnp.maximum(sh_utils.eval_sh(obj.features, d_rot, obj.sh_degree) + 0.5, 0.0)
    return pos, cov6, rgb
print("A deform+SH        %.2f ms" % bench(phaseA, vdef), flush=True)

pos, cov6, rgb = jax.jit(phaseA)(vdef)
op = obj.opacity

# phase B: preprocess
def phaseB(pos, cov6, op):
    return prep_mod.preprocess(pos, cov6, cam, W, H, opacity=op)
print("B preprocess       %.2f ms" % bench(phaseB, pos, cov6, op), flush=True)
prep = jax.jit(phaseB)(pos, cov6, op)

# phase C: binning
def phaseC(prep, op):
    return binning.build_tile_lists(prep, gx, gy, 1024, expand_capacity=m_cap,
        pair_capacity=p_cap, chunk=CHUNK, opacity=op, row_capacity=r_cap)
print("C binning          %.2f ms" % bench(phaseC, prep, op), flush=True)
tl = jax.jit(phaseC)(prep, op)

# phase D: pack + gather + transpose
def phaseD(prep, op, rgb, tl):
    feat = tile_blend.pack_features(prep.mean2d, prep.conic, op, rgb, prep.valid)
    mm = tl.sorted_gid.shape[0]
    pad_len = CHUNK + (-mm - CHUNK) % CHUNK
    gid_pad = jnp.concatenate([tl.sorted_gid, jnp.full((pad_len,), N, jnp.int32)])
    return feat[gid_pad].T
print("D gathers          %.2f ms" % bench(phaseD, prep, op, rgb, tl), flush=True)
pfT = jax.jit(phaseD)(prep, op, rgb, tl)

# phase E: blend fwd
def phaseE(pfT, tl):
    return tile_blend.blend_sorted_pallas(pfT, tl.block_tile, tl.aligned_starts,
        tl.starts, tl.counts, tl.sorted_shift, gx, NT, p_cap, CHUNK)
print("E blend fwd        %.2f ms" % bench(phaseE, pfT, tl), flush=True)

# phase A subparts
def phaseA1(vdef):
    return deformation_gradients9(d.v_ref, vdef, d.neighbors, d.mask)
print("A1 defgrad         %.2f ms" % bench(phaseA1, vdef), flush=True)
r9s9 = jax.jit(phaseA1)(vdef)

def phaseA2(vdef, r9, s9):
    return transfer_deformation9(d.v_ref, vdef, tuple(r9), tuple(s9),
        obj.gaussian_tris, obj.weights, obj.pos0, obj.cov6_0)
print("A2 transfer        %.2f ms" % bench(phaseA2, vdef, *r9s9), flush=True)
pos2, cov62, rhat2 = jax.jit(phaseA2)(vdef, *r9s9)

def phaseA3(pos, r_hat):
    dirs = pos - cam.campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    rx, ry, rz = maths.m9_vec(maths.m9_t(maths.m9_from_packed(r_hat)),
                              dirs[:, 0], dirs[:, 1], dirs[:, 2])
    d_rot = jnp.stack([rx, ry, rz], axis=-1)
    return jnp.maximum(sh_utils.eval_sh(obj.features, d_rot, obj.sh_degree) + 0.5, 0.0)
print("A3 sh              %.2f ms" % bench(phaseA3, pos2, rhat2), flush=True)
