from gaussianmesh_tpu.ops import (  # noqa: F401
    binning,
    oracle,
    preprocess,
    rasterize,
    tile_blend,
)
