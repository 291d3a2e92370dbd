import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
PB, CHUNK, FEAT, PIX = 64, 128, 16, 256
def kernel(pair_ref, out_ref, ckpt_ref, carry):
    b = pl.program_id(0)
    feat = pair_ref[...]
    x = feat[0][None, :] * jnp.ones((PIX, 1), jnp.float32)
    col = jnp.sum(x, axis=1, keepdims=True)     # (PIX, 1)
    carry[:, 0:1] = col
    ckpt_ref[0, :, :] = carry[:, 0:1]
    out_ref[0, 0, :] = col[:, 0]                # col -> row (1 transpose)
f = pl.pallas_call(
    kernel,
    grid=(PB,),
    in_specs=[pl.BlockSpec((FEAT, CHUNK), lambda b: (0, b))],
    out_specs=(pl.BlockSpec((1, 8, PIX), lambda b: (b % 8, 0, 0)),
               pl.BlockSpec((1, PIX, 1), lambda b: (b, 0, 0))),
    out_shape=(jax.ShapeDtypeStruct((8, 8, PIX), jnp.float32),
               jax.ShapeDtypeStruct((PB, PIX, 1), jnp.float32)),
    scratch_shapes=[pltpu.VMEM((PIX, 8), jnp.float32)],
)
x = jnp.ones((FEAT, PB * CHUNK), jnp.float32)
o, c = f(x)
print("OK", float(o.sum()), float(c.sum()), c.shape)
