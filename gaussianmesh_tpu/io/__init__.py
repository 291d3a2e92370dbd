from gaussianmesh_tpu.io import ply, mesh, gaussian_ply  # noqa: F401
