"""ctypes loader for the fmhr_native C++ helpers.

Compiles `csrc/fmhr_native.cpp` on first use (g++ -O3, cached in
~/.cache/fmhr_tpu keyed by source hash). Every entry point has a NumPy
fallback — `available()` is False when no compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc", "fmhr_native.cpp",
)


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.path.expanduser("~/.cache/fmhr_tpu"), f"fmhr_native_{digest}.so"
    )
    if os.path.exists(cache):
        return cache
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = cache + ".tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, cache)
        return cache
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.unique_edges.restype = ctypes.c_int64
    lib.unique_edges.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p,
                                 ctypes.c_int64]
    lib.normal_consistency_pairs.restype = ctypes.c_int64
    lib.normal_consistency_pairs.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int64,
    ]
    lib.loop_subdivide_faces.restype = ctypes.c_int64
    lib.loop_subdivide_faces.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, i32p, i32p, ctypes.c_int64,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def unique_edges(faces: np.ndarray, num_vertices: int):
    """C++ unique-edge extraction; returns [E, 2] int32 or None."""
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    max_e = faces.shape[0] * 3
    out = np.empty((max_e, 2), np.int32)
    n = lib.unique_edges(faces.reshape(-1), faces.shape[0], num_vertices,
                         out.reshape(-1), max_e)
    if n < 0:
        return None
    return out[:n].copy()


def normal_consistency_pairs(faces: np.ndarray, num_vertices: int):
    """C++ edge-opposite pair enumeration; [R, 4] int32 or None."""
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    max_r = faces.shape[0] * 6
    out = np.empty((max_r, 4), np.int32)
    n = lib.normal_consistency_pairs(
        faces.reshape(-1), faces.shape[0], num_vertices, out.reshape(-1), max_r
    )
    if n < 0:
        return None
    return out[:n].copy()


def loop_subdivide_faces(faces: np.ndarray, num_vertices: int):
    """C++ subdivision topology; returns (new_faces [4F, 3], edges [E, 2])
    or None."""
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    F = faces.shape[0]
    max_e = F * 3
    out_f = np.empty((F * 4, 3), np.int32)
    out_e = np.empty((max_e, 2), np.int32)
    n = lib.loop_subdivide_faces(
        faces.reshape(-1), F, num_vertices, out_f.reshape(-1),
        out_e.reshape(-1), max_e,
    )
    if n < 0:
        return None
    return out_f, out_e[:n].copy()
