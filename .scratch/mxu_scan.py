"""Microbench: blend fwd kernel, lane-scan cumprod vs MXU log-cumsum variant."""
import sys, time, functools
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gaussianmesh_tpu.ops import tile_blend as tb

FEAT, PIX = tb.FEAT, tb.PIX
CHUNK = 128
NT = 8160          # 1080p tiles
PB = 9216          # blocks

key = jax.random.PRNGKey(0)
featsT = jax.random.uniform(key, (FEAT, PB*CHUNK), jnp.float32)
# make plausible conics/opacity
featsT = featsT.at[tb.ROW_CA].set(0.02).at[tb.ROW_CC].set(0.02).at[tb.ROW_CB].set(0.0)
featsT = featsT.at[tb.ROW_X].set(jax.random.uniform(key, (PB*CHUNK,))*1920)
featsT = featsT.at[tb.ROW_Y].set(jax.random.uniform(key, (PB*CHUNK,))*1080)
featsT = featsT.at[tb.ROW_OP].set(0.5)
block_tile = jnp.concatenate([jnp.repeat(jnp.arange(NT, dtype=jnp.int32), PB//NT + 1)[:PB],
                              jnp.full((1,), NT, jnp.int32)])
astarts = jnp.arange(NT+1, dtype=jnp.int32) * (PB//NT) * CHUNK
counts = jnp.full((NT,), (PB//NT)*CHUNK, jnp.int32)

def bench(fn, *args, steps=20):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/steps*1e3

f = jax.jit(functools.partial(tb.blend_pairs_pallas, grid_x=120, num_tiles=NT, chunk=CHUNK))
print("current fwd:", round(bench(f, featsT, block_tile, astarts, counts), 2), "ms for", PB, "blocks")
