from gaussianmesh_tpu.utils import maths, sh, graphics, lr, subdivision  # noqa: F401
