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
