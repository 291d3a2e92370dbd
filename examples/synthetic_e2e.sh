#!/bin/bash
# End-to-end pipeline on a generated synthetic scene — the runnable
# analog of the reference's test.sh / test2.sh recipes
# (/root/reference/test.sh): train -> render -> metrics -> edit.
# Usage: bash examples/synthetic_e2e.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/gm_e2e}"
SCENE="$WORK/scene"; MODEL="$WORK/model"
mkdir -p "$WORK"

python - "$SCENE" <<'PY'
import sys, os
sys.path.insert(0, "."); sys.path.insert(0, "tests")
import jax
# dataset generation is tiny; run it on CPU so it works even when the
# accelerator is busy/unreachable (GM_EXAMPLE_PLATFORM overrides)
jax.config.update("jax_platforms", os.environ.get("GM_EXAMPLE_PLATFORM", "cpu"))
from tests.test_cli_pipeline import _make_dataset
_make_dataset(sys.argv[1], n_cams=12)
print("scene written to", sys.argv[1])
PY

python -m gaussianmesh_tpu.cli.train_mesh -s "$SCENE" -m "$MODEL" \
    --input_mesh "$SCENE/proxy.obj" --iterations 400 --init_target 500 \
    --densify_until_iter 200 --test_iterations 400 --save_iterations 400 \
    --sh_degree 1 --max_per_tile 256 --eval

python -m gaussianmesh_tpu.cli.render -m "$MODEL" --iteration 400 \
    --max_per_tile 256
python -m gaussianmesh_tpu.cli.metrics -m "$MODEL"

python - "$WORK" <<'PY'
import sys
sys.path.insert(0, "."); sys.path.insert(0, "tests")
import numpy as np
from tests.meshes import icosphere
from gaussianmesh_tpu.io import mesh as mesh_io
v, f = icosphere(1)
v2 = v.copy(); v2[:, 1] *= 0.5
mesh_io.write_triangle_mesh(sys.argv[1] + "/deformed.obj", v2, f)
PY
python -m gaussianmesh_tpu.cli.edit -m "$MODEL" \
    --gaussian_ply "$MODEL/point_cloud/iteration_400/point_cloud.ply" \
    --origin_mesh "$SCENE/proxy.obj" \
    --deformed_mesh "$WORK/deformed.obj" \
    --out "$WORK/edit_out" --orbit 8 --max_per_tile 256
echo "E2E OK: renders in $MODEL, edit frames in $WORK/edit_out"
