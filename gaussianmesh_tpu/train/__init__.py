from gaussianmesh_tpu.train import loss, optim, densify  # noqa: F401
