"""Full-training-state checkpoints — the capture()/restore() equivalent.

Reference (scene/mesh_based_gaussian_model.py:76-120 +
train_mesh_gaussian.py:133-135): a tuple of params, accumulators and the
Adam state dict saved with jt.save at --checkpoint_iterations, restored
with --start_checkpoint. Here: the whole training pytree (params, opt
state, densification stats, binding, mesh vertices, step) serialized with
flax msgpack into one file.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_tree))


def load_checkpoint(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# ---------------------------------------------------------------------------
# Sharded checkpoints (orbax): for the Gaussian-table-sharded regime the
# msgpack path above would gather the full table to one host per save —
# wrong shape at >1M Gaussians. Orbax writes each shard from its owner
# (per-host, parallel IO in multi-process runs) and restores with the
# shardings of a template pytree, so a resumed sharded run never
# materializes the global table on any single device.
# ---------------------------------------------------------------------------


def save_checkpoint_sharded(path: str, tree) -> None:
    """OCDBT checkpoint at `path` (a directory), preserving shardings."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_checkpoint_sharded(path: str, template):
    """Restore into the SHARDINGS of `template` (an abstract or concrete
    pytree: each leaf's .sharding drives placement at load)."""
    import orbax.checkpoint as ocp

    def spec(x):
        if hasattr(x, "sharding"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    abstract = jax.tree.map(spec, template)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), abstract)
    ckptr.close()
    return out
