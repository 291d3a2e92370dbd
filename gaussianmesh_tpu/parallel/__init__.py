from gaussianmesh_tpu.parallel import sharding, train_step  # noqa: F401
