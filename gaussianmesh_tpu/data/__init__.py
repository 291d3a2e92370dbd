from gaussianmesh_tpu.data import cameras, readers  # noqa: F401
