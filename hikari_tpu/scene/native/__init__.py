"""Native (C++) scene-compiler components.

The reference's hot host-side loops are the SAH BVH builds (Rust ``bvh``
crate; src/mesh_material/mod.rs:458, instance.rs:368/425) and the alias-table
pour loop (mod.rs:353-372). Here the same roles are played by a small C++
library compiled on demand with ``g++ -O3`` and bound via ctypes
(pybind11 is not available in this image).

``get_builder()`` returns a Builder exposing ``build(mins, maxs) -> FlatBvh``
or None when the toolchain is unavailable — callers fall back to the numpy
implementation in scene/bvh.py, which produces output with the identical
contract (differential-tested in tests/test_bvh.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_builder = None
_builder_failed = False

_SRC = os.path.join(os.path.dirname(__file__), "bvh_builder.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_bvh_builder.so")


class Builder:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.hikari_bvh_build.restype = ctypes.c_int64
        lib.hikari_bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # mins
            ctypes.POINTER(ctypes.c_float),  # maxs
            ctypes.c_int64,  # n prims
            ctypes.POINTER(ctypes.c_float),  # out node mins
            ctypes.POINTER(ctypes.c_float),  # out node maxs
            ctypes.POINTER(ctypes.c_int32),  # out entry
            ctypes.POINTER(ctypes.c_int32),  # out exit
        ]
        lib.hikari_alias_table_build.restype = None
        lib.hikari_alias_table_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # areas
            ctypes.c_int64,  # n
            ctypes.POINTER(ctypes.c_float),  # out prob
            ctypes.POINTER(ctypes.c_int32),  # out index
        ]

    def build(self, mins: np.ndarray, maxs: np.ndarray):
        from hikari_tpu.scene.bvh import FlatBvh

        mins = np.ascontiguousarray(mins, dtype=np.float32).reshape(-1, 3)
        maxs = np.ascontiguousarray(maxs, dtype=np.float32).reshape(-1, 3)
        n = len(mins)
        if n == 0:
            return FlatBvh.empty()
        max_nodes = 2 * n - 1 if n > 1 else 1
        node_mins = np.empty((max_nodes, 3), dtype=np.float32)
        node_maxs = np.empty((max_nodes, 3), dtype=np.float32)
        entry = np.empty(max_nodes, dtype=np.int32)
        exit_ = np.empty(max_nodes, dtype=np.int32)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        count = self._lib.hikari_bvh_build(
            mins.ctypes.data_as(fp),
            maxs.ctypes.data_as(fp),
            n,
            node_mins.ctypes.data_as(fp),
            node_maxs.ctypes.data_as(fp),
            entry.ctypes.data_as(ip),
            exit_.ctypes.data_as(ip),
        )
        count = int(count)
        return FlatBvh(
            node_mins[:count].copy(),
            node_maxs[:count].copy(),
            entry[:count].copy(),
            exit_[:count].copy(),
            np.full(count, -1, dtype=np.int32),
        )

    def build_alias_table(self, areas: np.ndarray):
        areas = np.ascontiguousarray(areas, dtype=np.float32)
        n = len(areas)
        prob = np.zeros(n, dtype=np.float32)
        index = np.arange(n, dtype=np.int32)
        if n:
            self._lib.hikari_alias_table_build(
                areas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n,
                prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        return prob, index


def _compile() -> ctypes.CDLL | None:
    if not os.path.exists(_SRC):
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            _SRC,
            "-o",
            _LIB + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        return ctypes.CDLL(_LIB)
    except OSError:
        return None


def get_builder() -> Builder | None:
    global _builder, _builder_failed
    if _builder is not None or _builder_failed:
        return _builder
    with _lock:
        if _builder is None and not _builder_failed:
            lib = _compile()
            if lib is None:
                _builder_failed = True
            else:
                _builder = Builder(lib)
    return _builder
