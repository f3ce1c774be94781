"""ctypes bindings for the native C++ components (libpfemnative.so).

Build with `make -C pfemfort_tpu/native` (g++ only, no external deps).
Every entry point has a pure-numpy fallback elsewhere in the package, so the
native library is an accelerator, not a requirement:
  * rcb_partition  -> parallel/partition.py:rcb_partition
  * greedy_partition -> parallel/partition.py:greedy_graph_partition
  * gen_tet_mesh   -> mesh/generate.py:box_tet (+ mesh/io.py:write_dat)
  * write_vtk      -> io/vtk.py:write_vtk
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "build",
                         "libpfemnative.so")
_lib = None


def load(path: Optional[str] = None):
    """Load (and cache) the native library; returns None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    p = path or _LIB_PATH
    if not os.path.exists(p):
        return None
    lib = ctypes.CDLL(p)
    lib.pfem_rcb_partition.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.pfem_greedy_partition.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    lib.pfem_edge_cut.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.pfem_edge_cut.restype = ctypes.c_int64
    lib.pfem_gen_tet_mesh.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_char_p]
    lib.pfem_gen_tet_mesh.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def rcb_partition(centroids: np.ndarray, nparts: int) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library not built"
    c = np.ascontiguousarray(centroids, dtype=np.float64)
    n, dim = c.shape
    out = np.empty(n, dtype=np.int32)
    lib.pfem_rcb_partition(_ptr(c, ctypes.c_double), n, dim, nparts,
                           _ptr(out, ctypes.c_int32))
    return out


def greedy_partition(conn: np.ndarray, n_node: int, ncommon: int,
                     nparts: int) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library not built"
    c = np.ascontiguousarray(conn, dtype=np.int32)
    n_elem, npe = c.shape
    out = np.empty(n_elem, dtype=np.int32)
    lib.pfem_greedy_partition(_ptr(c, ctypes.c_int32), n_elem, npe, n_node,
                              ncommon, nparts, _ptr(out, ctypes.c_int32))
    return out


def edge_cut(conn: np.ndarray, n_node: int, ncommon: int,
             part: np.ndarray) -> int:
    lib = load()
    assert lib is not None, "native library not built"
    c = np.ascontiguousarray(conn, dtype=np.int32)
    p = np.ascontiguousarray(part, dtype=np.int32)
    return int(lib.pfem_edge_cut(_ptr(c, ctypes.c_int32), c.shape[0],
                                 c.shape[1], n_node, ncommon,
                                 _ptr(p, ctypes.c_int32)))


def gen_tet_mesh(x0, x1, nex, y0, y1, ney, z0, z1, nez, prefix: str) -> None:
    lib = load()
    assert lib is not None, "native library not built"
    rc = lib.pfem_gen_tet_mesh(x0, x1, nex, y0, y1, ney, z0, z1, nez,
                               prefix.encode())
    if rc != 0:
        raise IOError(f"pfem_gen_tet_mesh failed writing {prefix}-*.dat")
