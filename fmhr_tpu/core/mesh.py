"""Static mesh topology + on-device mesh operators.

Design note (TPU-first): the reference rebuilds a sparse uniform Laplacian
from scratch on EVERY optimization step
(`/root/reference/models/utils.py:661-693` called from
`laplacian_smoothing`, `models/utils.py:696-722`) and scatter-adds with
`index_add_`. Mesh topology is fixed for the whole run, so here all index
structure (unique edges, degrees, normal-consistency pairs) is precomputed
ONCE on the host into static int32 arrays, and the per-step math is pure
gather/segment-sum that XLA fuses — no sparse formats, no per-step host
work, deterministic reductions (no atomics).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def unique_edges(faces: np.ndarray, num_vertices: int) -> tuple[np.ndarray, np.ndarray]:
    """Unique undirected edges and the face->edge incidence map.

    Parity: `models/utils.py:551-571` (get_edges): edges are gathered in the
    order [e12, e20, e01] over faces, sorted within each pair, hashed as
    V*lo+hi, and uniqued — so the unique edge list is sorted by (lo, hi).

    Returns:
      edges: [E, 2] int32 with edges[:,0] < edges[:,1], lexicographic order.
      faces_to_edges: [F, 3] int32; column k is the edge opposite... (same
      layout as the reference: rows are faces, columns correspond to the
      stacking order e12, e20, e01).
    """
    faces = np.asarray(faces, np.int64)
    F = faces.shape[0]
    v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
    e = np.concatenate(
        [np.stack([v1, v2], 1), np.stack([v2, v0], 1), np.stack([v0, v1], 1)], 0
    )
    e.sort(axis=1)
    h = e[:, 0] * num_vertices + e[:, 1]
    uniq, inverse = np.unique(h, return_inverse=True)
    edges = np.stack([uniq // num_vertices, uniq % num_vertices], 1)
    faces_to_edges = inverse.reshape(3, F).T
    return edges.astype(np.int32), faces_to_edges.astype(np.int32)


@dataclasses.dataclass(frozen=True)
class MeshTopology:
    """Host-precomputed static topology for a fixed (V, F) mesh.

    All members are numpy int32/float32 arrays; pass them into jitted
    functions as static data (they become constants) or as ordinary args.
    """

    num_vertices: int
    faces: np.ndarray          # [F, 3] int32
    edges: np.ndarray          # [E, 2] int32, lo < hi, lexicographic
    faces_to_edges: np.ndarray # [F, 3] int32
    degrees: np.ndarray        # [V] float32 — vertex valence (edge count)
    # gather-only incidence tables (see vertex_normals/uniform_laplacian):
    vert_slot_incidence: np.ndarray  # [V, D] int32 (face*3+corner slots
    #                                  referencing v; sentinel = 3F)
    nbr_incidence: np.ndarray        # [V, Dn] int32 (neighbor vertex ids;
    #                                  sentinel = V)

    @classmethod
    def build(cls, faces: np.ndarray, num_vertices: int) -> "MeshTopology":
        faces = np.asarray(faces, np.int32)
        V = int(num_vertices)
        edges, f2e = unique_edges(faces, num_vertices)
        deg = np.zeros(num_vertices, np.float32)
        np.add.at(deg, edges[:, 0], 1.0)
        np.add.at(deg, edges[:, 1], 1.0)
        slot_inc = _slot_incidence(faces.reshape(-1), V,
                                   sentinel=3 * faces.shape[0])
        both = np.concatenate([edges, edges[:, ::-1]], 0)  # directed
        nbr_inc = _slot_incidence(both[:, 0], V, sentinel=-1,
                                  values=both[:, 1], value_sentinel=V)
        return cls(
            num_vertices=V,
            faces=faces,
            edges=edges,
            faces_to_edges=f2e,
            degrees=deg,
            vert_slot_incidence=slot_inc,
            nbr_incidence=nbr_inc,
        )


def _slot_incidence(keys: np.ndarray, V: int, sentinel: int,
                    values: np.ndarray | None = None,
                    value_sentinel: int | None = None) -> np.ndarray:
    """Dense [V, D] table: row v lists the indices i with keys[i] == v
    (or values[i] at those indices when `values` is given), padded with
    the sentinel. D = max multiplicity."""
    keys = np.asarray(keys, np.int64)
    order = np.argsort(keys, kind="stable").astype(np.int32)
    counts = np.bincount(keys, minlength=V)
    D = max(1, int(counts.max()) if keys.size else 1)
    fill = sentinel if values is None else value_sentinel
    out = np.full((V, D), fill, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    rows = np.repeat(np.arange(V), counts)
    cols = np.arange(keys.size) - starts[keys[order]]
    out[rows, cols] = order if values is None else values[order]
    return out


def vertex_normals(vertices: jax.Array, faces, incidence=None) -> jax.Array:
    """Area-weighted vertex normals, normalized.

    vertices: [B, V, 3] (or [V, 3]); faces: [F, 3] int.
    Parity: `models/utils.py:508-548` (get_normals, pytorch3d-derived):
    each face adds the cross product of its two adjacent edges to each of
    its three corners; result L2-normalized with eps=1e-6.

    Default implementation: one gather + three scatter-adds via
    `.at[].add` (XLA lowers this to a deterministic sorted segment
    reduction on TPU). With `incidence` (MeshTopology.vert_slot_incidence,
    [V, D] slot ids face*3+corner, sentinel 3F) both directions become
    GATHERS via custom_vjp — the VJP of the corner gather is an incidence
    gather-sum instead of XLA's sort-based scatter-add (measured ~4 ms at
    100k faces on v5e), and the face→vertex accumulation's VJP is the
    corner gather. Same value up to f32 summation order.
    """
    if incidence is not None and vertices.ndim == 2:
        return _vertex_normals_inc(vertices, faces, incidence)
    squeeze = vertices.ndim == 2
    if squeeze:
        vertices = vertices[None]
    if incidence is not None:
        return jax.vmap(
            lambda v: _vertex_normals_inc(v, faces, incidence))(vertices)
    faces = jnp.asarray(faces, jnp.int32)
    tri = vertices[:, faces]  # [B, F, 3, 3]
    a, b, c = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
    n0 = jnp.cross(b - a, c - a)  # contribution to corner 0
    n1 = jnp.cross(c - b, a - b)  # corner 1
    n2 = jnp.cross(a - c, b - c)  # corner 2
    normals = jnp.zeros_like(vertices)
    normals = normals.at[:, faces[:, 0]].add(n0)
    normals = normals.at[:, faces[:, 1]].add(n1)
    normals = normals.at[:, faces[:, 2]].add(n2)
    normals = safe_normalize(normals, eps=1e-12)
    return normals[0] if squeeze else normals


def _vertex_normals_inc(vertices: jax.Array, faces, incidence) -> jax.Array:
    """Scatter-free vertex normals for one [V, 3] mesh (see above).

    Exploits that the reference formula's three corner contributions
    (b-a)x(c-a), (c-b)x(a-b), (a-c)x(b-c) are the SAME face normal
    (edge-pair cross products of one triangle, equal in exact
    arithmetic) — so the vertex normal is just the sum of incident FACE
    normals: one cross per face, a [F+1, 3] table, and a face-incidence
    gather (slot // 3). Differs from the scatter path only in f32
    summation order/ulps.
    """
    faces_j = jnp.asarray(faces, jnp.int32)          # [F, 3]
    inc_j = jnp.asarray(incidence, jnp.int32)        # [V, D] slots
    face_inc = inc_j // 3                            # [V, D], sentinel F

    def slot_sum(x):
        # [3F, C] slot-major (f*3 + corner) -> [V, C]
        xp = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)])
        return xp[inc_j].sum(axis=1)

    @jax.custom_vjp
    def corner_gather(verts):
        return verts[faces_j]                        # [F, 3, 3]

    def corner_gather_fwd(verts):
        return verts[faces_j], None

    def corner_gather_bwd(_, g):
        # each slot f*3+k is owned by exactly one vertex faces[f, k], so
        # the scatter-add transpose equals the incidence gather-sum
        return (slot_sum(g.reshape(-1, g.shape[-1])),)

    corner_gather.defvjp(corner_gather_fwd, corner_gather_bwd)

    @jax.custom_vjp
    def face_sum(fn):
        # [F, 3] face normals -> [V, 3] incident sums
        fnp = jnp.concatenate([fn, jnp.zeros((1, 3), fn.dtype)])
        return fnp[face_inc].sum(axis=1)

    def face_sum_fwd(fn):
        return face_sum(fn), None

    def face_sum_bwd(_, g):
        # d fn[f] = sum over the face's three corners of g at the owning
        # vertex — a plain [F, 3]-row gather + tiny sum
        return (g[faces_j].sum(axis=1),)

    face_sum.defvjp(face_sum_fwd, face_sum_bwd)

    tri = corner_gather(vertices)
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return safe_normalize(face_sum(fn), eps=1e-12)


def safe_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize with a backward pass that is finite at x = 0.

    `x / max(||x||, eps)` still produces NaN gradients at exactly zero
    (d||x||/dx = x/||x||); `x * rsqrt(sum(x²) + eps)` does not.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps)


def edge_lengths_sq(vertices: jax.Array, faces) -> jax.Array:
    """Concatenated squared per-face edge lengths [3F] (order ab, cb, ac).

    Parity: `mesh_sfs_optim.py:184-188, 296-302`.
    """
    faces = jnp.asarray(faces, jnp.int32)
    a = vertices[..., faces[:, 0], :]
    b = vertices[..., faces[:, 1], :]
    c = vertices[..., faces[:, 2], :]
    return jnp.concatenate(
        [
            jnp.sum((a - b) ** 2, -1),
            jnp.sum((c - b) ** 2, -1),
            jnp.sum((a - c) ** 2, -1),
        ],
        axis=-1,
    )


def uniform_laplacian(vertices: jax.Array, edges, degrees,
                      nbr_incidence=None) -> jax.Array:
    """L @ verts for the uniform graph Laplacian L = D^{-1}A - I.

    vertices: [V, C]; edges: [E, 2] int32; degrees: [V] float32.
    With `nbr_incidence` (MeshTopology.nbr_incidence, [V, Dn] neighbor
    vertex ids, sentinel V) the neighbor sum A @ x runs as one dense
    gather with a custom VJP that exploits A's symmetry (the transpose of
    A @ x is A @ g) — no scatter-adds in either direction.
    """
    degrees = jnp.asarray(degrees, vertices.dtype)
    safe_deg = jnp.where(degrees > 0, degrees, 1.0)
    if nbr_incidence is not None:
        nbr_j = jnp.asarray(nbr_incidence, jnp.int32)

        def a_mat(x):
            xp = jnp.concatenate(
                [x, jnp.zeros((1,) + x.shape[1:], x.dtype)])
            return xp[nbr_j].sum(axis=1)

        @jax.custom_vjp
        def nbr_sum_fn(x):
            return a_mat(x)

        nbr_sum_fn.defvjp(lambda x: (a_mat(x), None),
                          lambda _, g: (a_mat(g),))
        return nbr_sum_fn(vertices) / safe_deg[:, None] - vertices
    edges = jnp.asarray(edges, jnp.int32)
    nbr_sum = jnp.zeros_like(vertices)
    nbr_sum = nbr_sum.at[edges[:, 0]].add(vertices[edges[:, 1]])
    nbr_sum = nbr_sum.at[edges[:, 1]].add(vertices[edges[:, 0]])
    return nbr_sum / safe_deg[:, None] - vertices


def laplacian_smoothing(vertices: jax.Array, edges, degrees,
                        faces=None, method: str = "uniform",
                        nbr_incidence=None) -> jax.Array:
    """Laplacian smoothing loss (scalar), method in uniform|cot|cotcurv.

    Parity: `models/utils.py:696-722`. method="uniform" is the only one
    the reference's live call sites use: mean over vertices of
    ||(D^{-1}A - I) v||_2. NOTE the reference treats the Laplacian matrix
    as a constant (built under no_grad) but `L.mm(verts)` still backprops
    to verts — matched here because the edge/degree arrays are constants
    (and the cot weights are stop_gradient'ed).

    "cot"/"cotcurv" (`models/utils.py:700-716`) use the cotangent
    Laplacian from `laplacian_cot`; they need `faces` and ignore
    edges/degrees.
    """
    if method == "uniform":
        lap = uniform_laplacian(vertices, edges, degrees,
                                nbr_incidence=nbr_incidence)
    elif method in ("cot", "cotcurv"):
        if faces is None:
            raise ValueError(f"method={method!r} requires faces")
        Lv, rowsum, inv_areas = laplacian_cot(vertices, faces)
        if method == "cot":
            # reference: norm_w[idx>0] = 1/norm_w; non-positive rows KEEP
            # their raw (possibly negative) row sum (`:704-706`)
            norm_w = jnp.where(rowsum > 0, 1.0 / jnp.where(rowsum > 0,
                                                           rowsum, 1.0),
                               rowsum)
            lap = Lv * norm_w[:, None] - vertices
        else:
            lap = (Lv - rowsum[:, None] * vertices) * (
                0.25 * inv_areas[:, None])
    else:
        raise ValueError(f"unknown laplacian method {method!r}")
    # sqrt(x + eps) instead of norm: torch's norm backward returns a zero
    # subgradient at 0, JAX's returns NaN — the eps keeps it finite.
    row = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-20)
    return jnp.sum(row) / vertices.shape[0]


def laplacian_cot(vertices: jax.Array, faces) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Cotangent Laplacian applied to the vertices (segment-sum form).

    Parity: `models/utils.py:618-658` (laplacian_cot): per-face cotangent
    weights cot(angle)/4 with Heron-area clamp 1e-12, symmetrized
    L = W + W^T, plus per-vertex inverse incident-face-area. The reference
    materializes a sparse [V, V] matrix; topology is static here so L@v,
    the L row sums, and the areas are three scatter-adds — no sparse
    formats (TPU-friendly, deterministic).

    Weights and areas are stop_gradient'ed to match the reference's
    torch.no_grad() build: gradients flow only through the gathered
    vertex values, exactly like `L.mm(verts)` with constant L.

    Returns (L @ vertices [V,3], row sums of L [V], inv_areas [V]).
    """
    faces = jnp.asarray(faces, jnp.int32)
    v = vertices
    fv = v[faces]                                     # [F, 3, 3]
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
    A = jnp.linalg.norm(v1 - v2, axis=1)
    B = jnp.linalg.norm(v0 - v2, axis=1)
    C = jnp.linalg.norm(v0 - v1, axis=1)
    s = 0.5 * (A + B + C)
    area = jnp.sqrt(jnp.clip(s * (s - A) * (s - B) * (s - C), 1e-12, None))
    A2, B2, C2 = A * A, B * B, C * C
    cot = jnp.stack([(B2 + C2 - A2), (A2 + C2 - B2), (A2 + B2 - C2)], 1)
    cot = jax.lax.stop_gradient(cot / area[:, None] / 4.0)
    area = jax.lax.stop_gradient(area)

    ii = faces[:, [1, 2, 0]].reshape(-1)
    jj = faces[:, [2, 0, 1]].reshape(-1)
    w = cot.reshape(-1)
    V = v.shape[0]
    # L = W + W^T: each (ii, jj, w) entry contributes w*v[jj] to row ii
    # and w*v[ii] to row jj
    Lv = jnp.zeros_like(v)
    Lv = Lv.at[ii].add(w[:, None] * v[jj]).at[jj].add(w[:, None] * v[ii])
    rowsum = jnp.zeros((V,), v.dtype).at[ii].add(w).at[jj].add(w)
    areas = jnp.zeros((V,), v.dtype).at[faces.reshape(-1)].add(
        jnp.repeat(area, 3))
    inv_areas = jnp.where(areas > 0,
                          1.0 / jnp.where(areas > 0, areas, 1.0), areas)
    return Lv, rowsum, inv_areas


def normal_consistency_pairs(faces: np.ndarray, num_vertices: int) -> np.ndarray:
    """Index arrays for the mesh normal-consistency loss.

    For every interior edge (shared by exactly two faces) returns
    [e0, e1, v_a, v_b]: the edge endpoints and the two opposite vertices.
    This is the host-side preprocessing the reference implements as a C++
    torch extension (`models/csrc/normal_consistency.cpp`, currently dormant
    at `models/utils.py:573-616`); done here with numpy at topology-build
    time (static per run, so no runtime cost).
    """
    faces = np.asarray(faces, np.int64)
    # Hot path: the C++ helper (csrc/fmhr_native.cpp) — O(3F log 3F) with
    # no Python loops; required for the ~200k-face subdivided meshes.
    from ..utils import native

    if native.available():
        rows = native.normal_consistency_pairs(faces.astype(np.int32),
                                               num_vertices)
        if rows is not None:
            return rows

    edges, f2e = unique_edges(faces, num_vertices)
    E = edges.shape[0]
    opp = [[] for _ in range(E)]
    # Opposite vertex of edge (v1,v2) in face (v0,v1,v2) is v0, etc.
    opp_vertex = faces[:, [0, 1, 2]]  # column k opposite to f2e column k
    for k in range(3):
        for f in range(faces.shape[0]):
            opp[f2e[f, k]].append(opp_vertex[f, k])
    rows = []
    for ei in range(E):
        vs = opp[ei]
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                rows.append((edges[ei, 0], edges[ei, 1], vs[i], vs[j]))
    if not rows:
        return np.zeros((0, 4), np.int32)
    return np.asarray(rows, np.int32)


def normal_consistency_loss(vertices: jax.Array, pairs) -> jax.Array:
    """1 - cos between the normals of face pairs sharing an edge.

    Parity: `models/utils.py:428-497` (NormalConsistency.forward), reduced
    with mean as the dormant C++ path does (`models/utils.py:616`).
    """
    pairs = jnp.asarray(pairs, jnp.int32)
    v0 = vertices[..., pairs[:, 0], :]
    v1 = vertices[..., pairs[:, 1], :]
    va = vertices[..., pairs[:, 2], :]
    vb = vertices[..., pairs[:, 3], :]
    a1 = v1 - v0
    n1 = jnp.cross(va - v0, a1)
    n2 = jnp.cross(a1, vb - v0)
    cos = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    return jnp.mean(1.0 - cos)
