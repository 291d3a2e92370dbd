"""Ablate Pallas kernels inside the full fwd+bwd scan to find the abort.

usage: ablate_abort.py WHAT STEPS
WHAT: none | stub_bwd | stub_bwd_reads | stub_fwd_work
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussianmesh_tpu.ops import tile_blend
from jax.experimental import pallas as pl

what = sys.argv[1]
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

if what == "stub_bwd":
    # backward kernel writes zeros, no feat/ckpt/g reads at all
    def _stub(grid_x, chunk, num_tiles):
        def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, featA_ref,
                   featB_ref, ckpt_ref, g_ref, dpart_ref, qcarry):
            dpart_ref[...] = jnp.zeros_like(dpart_ref)
        return kernel
    tile_blend._make_sorted_bwd_kernel = _stub
elif what.startswith("reads_"):
    # which = subset of {a,b,c,g}: which input streams to actually read
    which = what[len("reads_"):]
    def _stub(grid_x, chunk, num_tiles):
        def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, featA_ref,
                   featB_ref, ckpt_ref, g_ref, dpart_ref, qcarry):
            s = jnp.float32(0.)
            if "a" in which: s = s + jnp.sum(featA_ref[...])
            if "b" in which: s = s + jnp.sum(featB_ref[...])
            if "c" in which: s = s + jnp.sum(ckpt_ref[...])
            if "g" in which: s = s + jnp.sum(g_ref[...])
            dpart_ref[...] = jnp.zeros_like(dpart_ref) + s * 1e-30
        return kernel
    tile_blend._make_sorted_bwd_kernel = _stub
elif what == "barrier_scalars":
    import gaussianmesh_tpu.ops.binning as _binning
    _orig_finish = _binning.finish_tile_lists
    def _finish(*a, **k):
        tl = _orig_finish(*a, **k)
        bt, ast, st, cn = jax.lax.optimization_barrier(
            (tl.block_tile, tl.aligned_starts, tl.starts, tl.counts))
        return tl._replace(block_tile=bt, aligned_starts=ast, starts=st,
                           counts=cn)
    _binning.finish_tile_lists = _finish
elif what == "stub_fwd_work":
    orig = tile_blend._make_sorted_fwd_kernel
    def _stub(grid_x, chunk, num_tiles, with_contrib):
        def kernel(btile_ref, astarts_ref, counts_ref, starts_ref, featA_ref,
                   featB_ref, out_ref, ckpt_ref, carry):
            b = pl.program_id(0)
            out_ref[...] = jnp.zeros_like(out_ref)
            ckpt_ref[...] = jnp.ones_like(ckpt_ref)
        return kernel
    tile_blend._make_sorted_fwd_kernel = _stub

from gaussianmesh_tpu.ops.rasterize import RasterizerConfig, rasterize
from scenes import look_at_camera, random_gaussians

WIDTH, HEIGHT = 1920, 1080
N = 100_000
cfg = RasterizerConfig(width=WIDTH, height=HEIGHT, max_per_tile=1024,
                       blend_chunk=128, pair_capacity_per_gaussian=9,
                       row_capacity_per_gaussian=3, use_pallas=True)
cam = look_at_camera(WIDTH, HEIGHT, distance=4.0)
sc = random_gaussians(N, seed=0, spread=1.4, scale_range=(0.004, 0.02))
bg = jnp.ones(3)

def one(means, cov6, op, rgb):
    out = rasterize(means, cov6, op, rgb, bg, cam, cfg)
    return jnp.sum(out.color * out.color)

@jax.jit
def loop(means, cov6, op, rgb):
    def body(carry, _):
        loss, grads = jax.value_and_grad(one, argnums=(0, 1, 2, 3))(
            means + carry * 1e-30, cov6, op, rgb)
        gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return loss + gsum * 1e-30, loss
    return jax.lax.scan(body, 0.0, None, length=steps)

args = (sc["means3d"], sc["cov6"], sc["opacity"], sc["rgb"])
print(f"what={what} steps={steps}: run...", flush=True)
out = loop(*args)
jax.block_until_ready(out)
print(f"OK: {float(out[0]):.6g}", flush=True)
