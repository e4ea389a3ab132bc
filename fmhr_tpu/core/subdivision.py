"""Loop subdivision (host-side, NumPy) and skinning-weight subdivision.

The reference subdivides the MANO mesh x3 with `trimesh.remesh.subdivide_loop`
(`/root/reference/mesh_sfs_optim.py:82,106`) and subdivides LBS skinning
weights by midpoint averaging over the subdivided face groups
(`/root/reference/repose.py:14-30`). Both are one-time host-side precompute
producing static arrays, so they live here in NumPy.

Conventions kept compatible with the trimesh output that the reference's
weight subdivision relies on:

- new vertices = [original vertices, one midpoint per unique edge], with
  unique edges ordered lexicographically by (lo, hi) vertex index;
- each input face (v0, v1, v2) with edge midpoints m01, m12, m20 emits the
  4 faces [v0, m01, m20], [m01, v1, m12], [m20, m12, v2], [m01, m12, m20]
  in consecutive order (the 4-group layout `repose.py:17-23` indexes into);
- vertex positions follow Loop's scheme (odd/even masks, boundary rules).
"""

from __future__ import annotations

import numpy as np

from .mesh import unique_edges


def _boundary_edges_mask(faces: np.ndarray, edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Boolean [E] mask of edges used by exactly one face."""
    f = np.asarray(faces, np.int64)
    e = np.concatenate(
        [f[:, [1, 2]], f[:, [2, 0]], f[:, [0, 1]]], 0
    )
    e.sort(axis=1)
    h = e[:, 0] * num_vertices + e[:, 1]
    uniq, counts = np.unique(h, return_counts=True)
    eh = edges[:, 0].astype(np.int64) * num_vertices + edges[:, 1]
    order = np.searchsorted(uniq, eh)
    return counts[order] == 1


def loop_subdivide(vertices: np.ndarray, faces: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One iteration of Loop subdivision. Returns (new_vertices, new_faces)."""
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    V = vertices.shape[0]
    edges, _ = unique_edges(faces, V)
    edges = edges.astype(np.int64)
    E = edges.shape[0]
    boundary = _boundary_edges_mask(faces, edges, V)

    # --- odd (midpoint) vertices -------------------------------------------
    mid = 0.5 * (vertices[edges[:, 0]] + vertices[edges[:, 1]])
    # Interior edges: 3/8 (a+b) + 1/8 (c+d) with c,d the opposite vertices.
    opp_sum = np.zeros((E, 3))
    opp_cnt = np.zeros(E)
    eh = edges[:, 0] * V + edges[:, 1]
    for k, (i, j, o) in enumerate(((1, 2, 0), (2, 0, 1), (0, 1, 2))):
        fe = np.sort(faces[:, [i, j]], axis=1)
        idx = np.searchsorted(eh, fe[:, 0] * V + fe[:, 1])
        np.add.at(opp_sum, idx, vertices[faces[:, o]])
        np.add.at(opp_cnt, idx, 1.0)
    interior = ~boundary
    odd = mid.copy()
    odd[interior] = (
        0.375 * (vertices[edges[interior, 0]] + vertices[edges[interior, 1]])
        + 0.125 * opp_sum[interior]
    )

    # --- even (original) vertices ------------------------------------------
    deg = np.zeros(V)
    nbr_sum = np.zeros((V, 3))
    np.add.at(deg, edges[:, 0], 1.0)
    np.add.at(deg, edges[:, 1], 1.0)
    np.add.at(nbr_sum, edges[:, 0], vertices[edges[:, 1]])
    np.add.at(nbr_sum, edges[:, 1], vertices[edges[:, 0]])

    k = np.maximum(deg, 3.0)
    beta = (0.625 - (0.375 + 0.25 * np.cos(2.0 * np.pi / k)) ** 2) / k
    even = vertices * (1.0 - deg * beta)[:, None] + beta[:, None] * nbr_sum

    # Boundary vertices: 3/4 v + 1/8 (two boundary neighbors).
    bverts = np.zeros(V, bool)
    bnbr_sum = np.zeros((V, 3))
    be = edges[boundary]
    np.add.at(bnbr_sum, be[:, 0], vertices[be[:, 1]])
    np.add.at(bnbr_sum, be[:, 1], vertices[be[:, 0]])
    bverts[be.ravel()] = True
    even[bverts] = 0.75 * vertices[bverts] + 0.125 * bnbr_sum[bverts]

    new_vertices = np.concatenate([even, odd], 0)

    # --- faces (4-group layout) --------------------------------------------
    def edge_index(a, b):
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return np.searchsorted(eh, lo * V + hi)

    m01 = V + edge_index(faces[:, 0], faces[:, 1])
    m12 = V + edge_index(faces[:, 1], faces[:, 2])
    m20 = V + edge_index(faces[:, 2], faces[:, 0])
    f0 = np.stack([faces[:, 0], m01, m20], 1)
    f1 = np.stack([m01, faces[:, 1], m12], 1)
    f2 = np.stack([m20, m12, faces[:, 2]], 1)
    f3 = np.stack([m01, m12, m20], 1)
    new_faces = np.stack([f0, f1, f2, f3], 1).reshape(-1, 3)

    return new_vertices.astype(np.float32), new_faces.astype(np.int64)


def loop_subdivide_iter(
    vertices: np.ndarray, faces: np.ndarray, iterations: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """`iterations` rounds of Loop subdivision (reference uses 3)."""
    for _ in range(iterations):
        vertices, faces = loop_subdivide(vertices, faces)
    return vertices, faces


def subdivide_weights(weights: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Midpoint-average skinning weights onto a subdivided mesh.

    Parity: `repose.py:14-24` (subdivide_weight). `faces` is the OUTPUT face
    array of one `loop_subdivide` round; for each 4-group, the midpoint rows
    get the mean of their two parent vertices' weights.
    """
    faces = np.asarray(faces, np.int64)
    V_new = int(faces.max()) + 1
    out = np.zeros((V_new, weights.shape[1]), weights.dtype)
    out[: weights.shape[0]] = weights
    g = faces.reshape(-1, 4, 3)
    v0, v1, v2 = g[:, 0, 0], g[:, 1, 1], g[:, 2, 2]
    m01, m20, m12 = g[:, 0, 1], g[:, 0, 2], g[:, 1, 2]
    out[m01] = 0.5 * (out[v0] + out[v1])
    out[m20] = 0.5 * (out[v0] + out[v2])
    out[m12] = 0.5 * (out[v1] + out[v2])
    return out


def subdivide_weights_loop(
    weights: np.ndarray, vertices: np.ndarray, faces: np.ndarray, iterations: int = 3
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Subdivide mesh and skinning weights together.

    Parity: `repose.py:26-30` (subdivide_weight_loop). Returns
    (vertices, faces, weights) after `iterations` rounds.
    """
    for _ in range(iterations):
        vertices, faces = loop_subdivide(vertices, faces)
        weights = subdivide_weights(weights, faces)
    return vertices, faces, weights
