from gaussianmesh_tpu.edit import deform, runtime, pose_paths  # noqa: F401
