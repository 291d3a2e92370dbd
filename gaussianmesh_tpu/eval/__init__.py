from gaussianmesh_tpu.eval import metrics, lpips  # noqa: F401
