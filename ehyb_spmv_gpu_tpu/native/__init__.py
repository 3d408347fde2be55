"""Native (C++) components, loaded via ctypes.

The reference's one true native dependency is the prebuilt ``libmtmetis.a``
multilevel k-way graph partitioner (``mtmetis.h:150``, called at
``reordering.c:126-139, 280-293``).  This package ships its own C++
implementation (``partition.cpp``: heavy-edge-matching coarsening + greedy
growing initial partition + boundary FM refinement) compiled on first use with
``g++`` and cached next to the source.  No pybind11 — plain C ABI + ctypes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "partition.cpp")
_LIB = os.path.join(_HERE, "libehybpart.so")
_lock = threading.Lock()
_lib = None


class NativeBuildError(RuntimeError):
    pass


def build_native(force: bool = False) -> str:
    """Compile partition.cpp → libehybpart.so (cached by mtime)."""
    with _lock:
        if (not force and os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
               "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise NativeBuildError(
                f"g++ failed ({proc.returncode}):\n{proc.stderr}")
        return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    lib = ctypes.CDLL(path)
    lib.ehyb_partition_kway.restype = ctypes.c_longlong
    lib.ehyb_partition_kway.argtypes = [
        ctypes.c_int,                                    # n vertices
        np.ctypeslib.ndpointer(np.int32, flags="C"),     # xadj [n+1]
        np.ctypeslib.ndpointer(np.int32, flags="C"),     # adjncy [m]
        ctypes.c_int,                                    # nparts
        ctypes.c_double,                                 # imbalance (e.g. 1.03)
        ctypes.c_int,                                    # seed
        np.ctypeslib.ndpointer(np.int32, flags="C"),     # out: part [n]
    ]
    _lib = lib
    return lib


def kway_partition_native(xadj: np.ndarray, adjncy: np.ndarray, n_parts: int,
                          imbalance: float = 1.03, seed: int = 0) -> np.ndarray:
    """k-way partition labels via the C++ partitioner.  Returns int32 [n].

    API shape mirrors ``MTMETIS_PartGraphKway`` (``mtmetis.h:150``): CSR
    adjacency in, per-vertex part id out; the return value is the edge cut.
    """
    lib = _load()
    xadj = np.ascontiguousarray(xadj, dtype=np.int32)
    adjncy = np.ascontiguousarray(adjncy, dtype=np.int32)
    n = xadj.shape[0] - 1
    out = np.empty(n, dtype=np.int32)
    cut = lib.ehyb_partition_kway(n, xadj, adjncy, int(n_parts),
                                  float(imbalance), int(seed), out)
    if cut < 0:
        raise RuntimeError(f"native partitioner failed (code {cut})")
    return out
