"""ctypes binding for the native deformation-gradient extractor.

`NativeACAP(mesh_path_or_arrays)` mirrors the reference's
`pyACAP.pyACAP(mesh_path)` / `GetRS(V_ref, V_def, 1, nthreads)` contract
(edittool/__init__.py:102,109-113) against native/acap.cpp (C++/OpenMP).
The shared library builds on demand with native/build.sh; when a
compiler is unavailable the JAX implementation (edit.deform) is the
fallback — both produce numerically matching (R, S).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libgmacap.so")

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.acap_get_rs.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.acap_get_rs.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_library()
        return True
    except Exception:
        return False


class NativeACAP:
    """pyACAP-compatible: construct from a mesh, call get_rs per frame."""

    def __init__(self, mesh_or_path, max_degree: int = 16):
        from gaussianmesh_tpu.edit.deform import build_one_ring
        if isinstance(mesh_or_path, str):
            from gaussianmesh_tpu.io import mesh as mesh_io
            v, f = mesh_io.read_triangle_mesh(mesh_or_path)
        else:
            v, f = mesh_or_path
        self.v_ref = np.ascontiguousarray(v, np.float32)
        self.triangles = np.asarray(f, np.int32)
        neighbors, mask = build_one_ring(self.triangles, v.shape[0],
                                         max_degree)
        self.neighbors = np.ascontiguousarray(neighbors, np.int32)
        self.mask = np.ascontiguousarray(mask, np.uint8)
        self._lib = _load_library()

    def get_rs(self, v_def: np.ndarray,
               n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
        """-> (R (V,3,3), S (V,3,3)) float32."""
        v_def = np.ascontiguousarray(v_def, np.float32)
        n = self.v_ref.shape[0]
        assert v_def.shape == (n, 3), v_def.shape
        r = np.empty((n, 9), np.float32)
        s = np.empty((n, 9), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        self._lib.acap_get_rs(
            self.v_ref.ctypes.data_as(fp), v_def.ctypes.data_as(fp), n,
            self.neighbors.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self.mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            self.neighbors.shape[1], r.ctypes.data_as(fp),
            s.ctypes.data_as(fp), n_threads)
        return r.reshape(n, 3, 3), s.reshape(n, 3, 3)

    # reference-style alias: GetRS(V_ref, V_def, 1, nthreads)
    def GetRS(self, v_ref, v_def, _one: int = 1, nthreads: int = 0):
        r, s = self.get_rs(np.asarray(v_def), nthreads)
        return r.reshape(-1, 9), s.reshape(-1, 9)
