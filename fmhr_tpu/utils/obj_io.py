"""Wavefront OBJ IO (order-preserving, no processing).

The reference leans on `trimesh.load(..., process=False,
maintain_order=True)` everywhere because vertex ORDER is load-bearing —
subdivided skinning weights are aligned by index
(`/root/reference/mesh_sfs_optim.py:72,366-369`). These readers/writers
never reorder, dedupe, or insert vertices.
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (vertices [V,3] float32, faces [F,3] int32, 0-based)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [p.split("/")[0] for p in line.split()[1:4]]
                faces.append([int(i) - 1 for i in idx])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
    )


def save_obj(path: str, verts, faces) -> None:
    verts = np.asarray(verts)
    faces = np.asarray(faces, np.int64)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for fc in faces + 1:
            f.write(f"f {fc[0]} {fc[1]} {fc[2]}\n")


def save_obj_with_colors(path: str, verts, faces, colors) -> None:
    """Per-vertex colors appended to `v` lines; faces written with the
    (0,2,1) flip of the reference exporter
    (`mesh_sfs_optim.py:19-28` save_obj_mesh_with_color)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces, np.int64)
    colors = np.asarray(colors)
    with open(path, "w") as f:
        for v, c in zip(verts, colors):
            f.write(
                "v %.4f %.4f %.4f %.4f %.4f %.4f\n"
                % (v[0], v[1], v[2], c[0], c[1], c[2])
            )
        for fc in faces + 1:
            f.write("f %d %d %d\n" % (fc[0], fc[2], fc[1]))
