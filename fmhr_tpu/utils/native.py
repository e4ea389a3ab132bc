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
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.marching_tets.restype = ctypes.c_int64
    lib.marching_tets.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, f32p, i32p, f32p, ctypes.c_int64, ctypes.c_int64,
        i64p,
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


def marching_tets(grid: np.ndarray, level: float = 0.0,
                  max_verts: int | None = None,
                  max_faces: int | None = None):
    """C++ marching tetrahedra (the SAP per-step isosurface hot loop);
    returns (verts [nv, 3] f32 in the [0, 1) cube, faces [nf, 3] i32,
    normals [nv, 3] f32) or None. Identical mesh (vertex/face order and
    winding included) to the NumPy fallback in fmhr_tpu/recon/marching.py.
    """
    lib = _load()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, np.float64)
    r0, r1, r2 = grid.shape
    ncube = max((r0 - 1) * (r1 - 1) * (r2 - 1), 1)
    hard_cap = ncube * 12  # 6 tets x <=2 tris, absolute worst case
    # a closed surface scales like O(r^2); start there and grow on overflow
    mf = max_faces or min(hard_cap, 32 * max(r0 * r1, r1 * r2, r0 * r2))
    while True:
        mv = max_verts or mf * 3 // 2 + 8
        out_v = np.empty((mv, 3), np.float32)
        out_f = np.empty((mf, 3), np.int32)
        out_n = np.empty((mv, 3), np.float32)
        counts = np.zeros(2, np.int64)
        rc = lib.marching_tets(grid.reshape(-1), r0, r1, r2, float(level),
                               out_v.reshape(-1), out_f.reshape(-1),
                               out_n.reshape(-1), mv, mf, counts)
        if rc == 0:
            nv, nf = int(counts[0]), int(counts[1])
            return out_v[:nv].copy(), out_f[:nf].copy(), out_n[:nv].copy()
        if max_faces is not None or mf >= hard_cap:
            return None
        mf = min(mf * 4, hard_cap)
