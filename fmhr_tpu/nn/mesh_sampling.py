"""CoMA-style mesh hierarchy: QSlim decimation + barycentric upsampling.

Host-side (NumPy) one-time precompute, equivalent in role to
`/root/reference/models/mesh_sampling.py` (which leans on the psbody.mesh
C++ AABB tree). Produces, per level: adjacency A, downsample matrix D,
upsample matrix U, graph Laplacian L — all returned DENSE because the GCN
meshes are small (<=778 vertices for MANO templates) and dense matmuls
map straight onto the TPU MXU, unlike torch.sparse spmm
(`models/gcn.py:178-209`).
"""

from __future__ import annotations

import heapq

import numpy as np


def adjacency(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    V = verts.shape[0]
    A = np.zeros((V, V), np.float32)
    for i, j in ((0, 1), (1, 2), (2, 0)):
        A[faces[:, i], faces[:, j]] = 1.0
        A[faces[:, j], faces[:, i]] = 1.0
    return A


def normalized_laplacian(A: np.ndarray) -> np.ndarray:
    """L = I - D^-1/2 A D^-1/2, rescaled to [-1, 1] assuming lmax=2.

    Parity: `models/mesh_sampling.py:13-41` (laplacian + rescale_L): the
    reference rescales by lmax=2 for Chebyshev stability, i.e.
    L_cheb = L - I = -D^-1/2 A D^-1/2.
    """
    d = A.sum(1)
    d_inv = np.zeros_like(d)
    np.divide(1.0, np.sqrt(d, where=d > 0), out=d_inv, where=d > 0)
    L = np.eye(A.shape[0], dtype=np.float32) - (d_inv[:, None] * A) * d_inv[None, :]
    return (L - np.eye(A.shape[0], dtype=np.float32)).astype(np.float32)


def _vertex_quadrics(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """4x4 error quadric per vertex (sum of face plane outer products)."""
    V = verts.shape[0]
    Q = np.zeros((V, 4, 4))
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(norm, 1e-12)
    d = -np.sum(n * tri[:, 0], axis=1, keepdims=True)
    p = np.concatenate([n, d], axis=1)  # [F, 4]
    pp = p[:, :, None] * p[:, None, :]
    for k in range(3):
        np.add.at(Q, faces[:, k], pp)
    return Q


def qslim_decimate(
    verts: np.ndarray, faces: np.ndarray, target_verts: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy quadric edge collapse keeping existing vertex positions.

    Destination of each collapse is the endpoint with the lower quadric
    error (CoMA's qslim_decimator_transformer behavior,
    `models/mesh_sampling.py:114-227`). Returns
    (new_faces [F',3], keep_idx [V'], parent [V] mapping old->kept root).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    V = verts.shape[0]
    Q = _vertex_quadrics(verts, faces)

    parent = np.arange(V)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    edges = set()
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges.add((min(a, b), max(a, b)))

    def cost(a, b):
        Qs = Q[a] + Q[b]
        ha = np.append(verts[a], 1.0)
        hb = np.append(verts[b], 1.0)
        ca = ha @ Qs @ ha
        cb = hb @ Qs @ hb
        return (ca, b, a) if cb > ca else (cb, a, b)  # (cost, dest, src)

    heap = []
    for a, b in edges:
        c, dest, src = cost(a, b)
        heapq.heappush(heap, (c, a, b))

    # Face-aliveness bookkeeping: stop before the mesh degenerates (thin
    # or very coarse meshes can lose every face otherwise).
    vert_faces = [set() for _ in range(V)]
    face_roots = [set(f) for f in faces.tolist()]
    for fi, f in enumerate(faces):
        for vtx in f:
            vert_faces[vtx].add(fi)
    alive_faces = len(face_roots)
    min_faces = 4

    alive = V
    while alive > target_verts and heap:
        c, a, b = heapq.heappop(heap)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        c2, dest, src = cost(ra, rb)
        if c2 > c + 1e-12:
            heapq.heappush(heap, (c2, ra, rb))
            continue
        # faces containing both endpoints die in this collapse
        dying = [
            fi for fi in vert_faces[ra] & vert_faces[rb]
            if len(face_roots[fi]) == 3
        ]
        if alive_faces - len(dying) < min_faces:
            continue
        parent[src] = dest
        Q[dest] = Q[dest] + Q[src]
        for fi in vert_faces[src]:
            face_roots[fi].discard(src)
            face_roots[fi].add(dest)
            vert_faces[dest].add(fi)
        for fi in dying:
            alive_faces -= 1
            face_roots[fi] = set()  # mark dead
        vert_faces[src] = set()
        alive -= 1

    roots = np.array([find(i) for i in range(V)])
    keep = np.unique(roots)
    remap = -np.ones(V, np.int64)
    remap[keep] = np.arange(keep.shape[0])
    new_faces = remap[roots[faces]]
    good = (
        (new_faces[:, 0] != new_faces[:, 1])
        & (new_faces[:, 1] != new_faces[:, 2])
        & (new_faces[:, 0] != new_faces[:, 2])
    )
    new_faces = new_faces[good]
    # dedupe faces regardless of rotation
    key = np.sort(new_faces, axis=1)
    _, uniq_idx = np.unique(key, axis=0, return_index=True)
    new_faces = new_faces[np.sort(uniq_idx)]
    return new_faces.astype(np.int64), keep, roots


def _closest_point_barycentric(p, tri):
    """Closest point on triangle to p; returns (dist2, bary [3])."""
    a, b, c = tri
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = ab @ ap, ac @ ap
    if d1 <= 0 and d2 <= 0:
        return np.sum((p - a) ** 2), np.array([1.0, 0, 0])
    bp = p - b
    d3, d4 = ab @ bp, ac @ bp
    if d3 >= 0 and d4 <= d3:
        return np.sum((p - b) ** 2), np.array([0.0, 1, 0])
    vc = d1 * d4 - d3 * d2
    if vc <= 0 and d1 >= 0 and d3 <= 0:
        v = d1 / (d1 - d3 + 1e-30)
        q = a + v * ab
        return np.sum((p - q) ** 2), np.array([1 - v, v, 0])
    cp = p - c
    d5, d6 = ab @ cp, ac @ cp
    if d6 >= 0 and d5 <= d6:
        return np.sum((p - c) ** 2), np.array([0.0, 0, 1])
    vb = d5 * d2 - d1 * d6
    if vb <= 0 and d2 >= 0 and d6 <= 0:
        w = d2 / (d2 - d6 + 1e-30)
        q = a + w * ac
        return np.sum((p - q) ** 2), np.array([1 - w, 0, w])
    va = d3 * d6 - d5 * d4
    if va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:
        w = (d4 - d3) / ((d4 - d3) + (d5 - d6) + 1e-30)
        q = b + w * (c - b)
        return np.sum((p - q) ** 2), np.array([0.0, 1 - w, w])
    denom = 1.0 / (va + vb + vc + 1e-30)
    v = vb * denom
    w = vc * denom
    return np.sum((p - (a + ab * v + ac * w)) ** 2), np.array([1 - v - w, v, w])


def barycentric_upsampler(
    fine_verts: np.ndarray, coarse_verts: np.ndarray, coarse_faces: np.ndarray
) -> np.ndarray:
    """U [V_fine, V_coarse]: each fine vertex expressed barycentrically in
    its nearest coarse triangle (role of `setup_deformation_transfer`,
    `models/mesh_sampling.py:70-111`; brute-force nearest instead of the
    psbody C++ AABB tree — one-time cost at these mesh sizes)."""
    Vf = fine_verts.shape[0]
    Vc = coarse_verts.shape[0]
    U = np.zeros((Vf, Vc), np.float32)
    if coarse_faces.shape[0] == 0:
        # degenerate coarse level: fall back to nearest-vertex assignment
        d2 = ((fine_verts[:, None] - coarse_verts[None]) ** 2).sum(-1)
        U[np.arange(Vf), d2.argmin(1)] = 1.0
        return U
    tris = coarse_verts[coarse_faces]  # [F, 3, 3]
    # coarse pass: distances to triangle centroids to shortlist candidates
    centroids = tris.mean(1)
    for i in range(Vf):
        p = fine_verts[i]
        d2c = np.sum((centroids - p) ** 2, 1)
        cand = np.argsort(d2c)[:12]
        best, bb, bf = np.inf, None, None
        for f in cand:
            d2, bary = _closest_point_barycentric(p, tris[f])
            if d2 < best:
                best, bb, bf = d2, bary, f
        U[i, coarse_faces[bf]] = bb
    return U


def generate_transform_matrices(verts, faces, ds_factors=(1, 2, 2, 2)):
    """Mesh hierarchy. Returns dict with lists (coarsest last):
    verts, faces, A (adjacency), D (downsample), U (upsample), L (cheb).

    Parity: `models/mesh_sampling.py:245-262`.
    """
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    Ms_v, Ms_f = [verts], [faces]
    As = [adjacency(verts, faces)]
    Ds, Us = [], []
    for factor in ds_factors:
        v, f = Ms_v[-1], Ms_f[-1]
        target = max(4, int(np.ceil(v.shape[0] / factor)))
        if factor == 1:
            nf, keep, roots = f, np.arange(v.shape[0]), np.arange(v.shape[0])
        else:
            nf, keep, roots = qslim_decimate(v, f, target)
        nv = v[keep]
        D = np.zeros((nv.shape[0], v.shape[0]), np.float32)
        D[np.arange(nv.shape[0]), keep] = 1.0
        U = (
            np.eye(v.shape[0], dtype=np.float32)
            if factor == 1
            else barycentric_upsampler(v, nv, nf)
        )
        Ms_v.append(nv)
        Ms_f.append(nf)
        As.append(adjacency(nv, nf))
        Ds.append(D)
        Us.append(U)
    Ls = [normalized_laplacian(a) for a in As]
    return {
        "verts": Ms_v, "faces": Ms_f, "A": As, "D": Ds, "U": Us, "L": Ls,
    }
