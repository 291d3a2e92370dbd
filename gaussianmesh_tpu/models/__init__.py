from gaussianmesh_tpu.models import gaussians, mesh_gaussians, render  # noqa: F401
