"""Unit tests for fmhr_tpu.core: rotations, cameras, SH, mesh ops, subdivision."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fmhr_tpu.core import (
    quat_to_matrix,
    rodrigues,
    rigid_transform_chain,
    decompose_projection,
    load_K_Rt_from_P,
    camera_matrices_from_P,
    sh_basis,
    sh_radiance,
    eval_sh,
    MeshTopology,
    vertex_normals,
    laplacian_smoothing,
    loop_subdivide,
    subdivide_weights,
)
from fmhr_tpu.core.cameras import project_points, ndc_projection
from fmhr_tpu.core.mesh import (
    edge_lengths_sq,
    normal_consistency_pairs,
    normal_consistency_loss,
    uniform_laplacian,
)
from fmhr_tpu.core.subdivision import subdivide_weights_loop


# ---------------------------------------------------------------- rotations
def test_rodrigues_orthonormal(rng):
    theta = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    R = rodrigues(theta)
    eye = jnp.eye(3)
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
    assert err < 1e-5
    assert jnp.allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


def test_rodrigues_known_axis():
    # pi/2 around z maps x->y
    theta = jnp.array([[0.0, 0.0, np.pi / 2]])
    R = rodrigues(theta)[0]
    np.testing.assert_allclose(R @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-5)


def test_quat_identity():
    R = quat_to_matrix(jnp.array([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_rigid_chain_identity_rotations(rng):
    # With identity rotations the relative transforms must be identity.
    J = 5
    parents = [0, 0, 1, 2, 3]
    Js = jnp.asarray(rng.normal(size=(2, J, 3)), jnp.float32)
    Rs = jnp.broadcast_to(jnp.eye(3), (2, J, 3, 3))
    posed, rel = rigid_transform_chain(Rs, Js, parents)
    np.testing.assert_allclose(posed, Js, atol=1e-6)
    np.testing.assert_allclose(
        rel, np.broadcast_to(np.eye(4), (2, J, 4, 4)), atol=1e-6
    )


def test_rigid_chain_root_rotation(rng):
    # Rotating only the root rotates children joints around the root.
    parents = [0, 0, 1]
    Js = jnp.array([[[0.0, 0, 0], [1, 0, 0], [2, 0, 0]]])
    Rz = rodrigues(jnp.array([[0.0, 0, np.pi / 2]]))
    Rs = jnp.stack([Rz[0], jnp.eye(3), jnp.eye(3)])[None]
    posed, _ = rigid_transform_chain(Rs, Js, parents)
    np.testing.assert_allclose(posed[0, 1], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(posed[0, 2], [0, 2, 0], atol=1e-5)


# ------------------------------------------------------------------ cameras
def _random_P(rng):
    K = np.array([[800.0, 0, 320], [0, 820.0, 240], [0, 0, 1]])
    R = np.asarray(
        jax.device_get(rodrigues(jnp.asarray(rng.normal(size=(1, 3)), jnp.float32)))[0],
        np.float64,
    )
    t = rng.normal(size=3) + np.array([0, 0, 5.0])
    return K @ np.concatenate([R, t[:, None]], 1), K, R, t


def test_decompose_projection_roundtrip(rng):
    for _ in range(5):
        P, K, R, t = _random_P(rng)
        K2, R2, C = decompose_projection(P)
        np.testing.assert_allclose(K2 / K2[2, 2], K, atol=1e-4)
        np.testing.assert_allclose(R2, R, atol=1e-6)
        # center satisfies P @ [C,1] = 0
        resid = P @ np.append(C, 1.0)
        assert np.abs(resid).max() < 1e-5


def test_decompose_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    for _ in range(5):
        P, _, _, _ = _random_P(rng)
        K_cv, R_cv, t_cv = cv2.decomposeProjectionMatrix(P)[:3]
        K, R, C = decompose_projection(P)
        np.testing.assert_allclose(K / K[2, 2], K_cv / K_cv[2, 2], atol=1e-5)
        np.testing.assert_allclose(R, R_cv, atol=1e-5)
        np.testing.assert_allclose(C, (t_cv[:3] / t_cv[3])[:, 0], atol=1e-5)


def test_projection_pipeline_pixel_mapping(rng):
    # A world point must land at the pixel predicted by K [R|t], in the
    # NDC convention of the reference (x right, y down in [-1,1]).
    P, K, R, t = _random_P(rng)
    W, H = 640, 480
    w2c_T, proj_T = camera_matrices_from_P(P, W, H)
    X = rng.normal(size=(10, 3))
    uvw = (K @ (R @ X.T + t[:, None])).T
    uv = uvw[:, :2] / uvw[:, 2:3]

    clip = project_points(jnp.asarray(X, jnp.float32), jnp.asarray(w2c_T), jnp.asarray(proj_T))
    ndc = clip[:, :2] / clip[:, 3:4]
    expect_x = uv[:, 0] / (W / 2.0) - 1.0
    expect_y = uv[:, 1] / (H / 2.0) - 1.0
    np.testing.assert_allclose(ndc[:, 0], expect_x, atol=1e-3)
    np.testing.assert_allclose(ndc[:, 1], expect_y, atol=1e-3)
    # w is view depth, z is -0.1
    np.testing.assert_allclose(clip[:, 2], -0.1, atol=1e-5)
    assert np.all(np.asarray(clip[:, 3]) > 0)


# ----------------------------------------------------------------------- SH
def test_sh_basis_shape_and_values():
    n = jnp.array([[0.0, 0.0, 1.0]])
    m = sh_basis(n, 3)
    assert m.shape == (1, 9)
    np.testing.assert_allclose(m[0], [1, 0, 1, 0, 0, 0, 2, 0, 0], atol=1e-6)


def test_sh_radiance_matches_basis_dot(rng):
    n = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    coeff = jnp.asarray(rng.normal(size=(9,)), jnp.float32)
    r = sh_radiance(coeff, n, 3)
    np.testing.assert_allclose(r, sh_basis(n, 3) @ coeff, atol=1e-5)


def test_eval_sh_constant_term():
    sh = jnp.zeros((4, 1, 25)).at[:, :, 0].set(1.0)
    out = eval_sh(4, sh, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(out, 0.28209479, atol=1e-6)


# --------------------------------------------------------------------- mesh
def _tetra():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return verts, faces


def test_topology_build():
    verts, faces = _tetra()
    topo = MeshTopology.build(faces, 4)
    assert topo.edges.shape == (6, 2)
    assert np.all(topo.degrees == 3)
    assert np.all(topo.edges[:, 0] < topo.edges[:, 1])


def test_vertex_normals_outward():
    verts, faces = _tetra()
    n = vertex_normals(jnp.asarray(verts), faces)
    # Vertex 3 = (0,0,1): its normal should point away from centroid.
    centroid = verts.mean(0)
    outward = verts[3] - centroid
    assert float(jnp.dot(n[3], jnp.asarray(outward))) > 0
    np.testing.assert_allclose(jnp.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_laplacian_zero_for_uniform_translation():
    verts, faces = _tetra()
    topo = MeshTopology.build(faces, 4)
    v = jnp.asarray(verts)
    lap = uniform_laplacian(v, topo.edges, topo.degrees)
    # For the regular tetra every vertex's neighbor-mean is the opposite
    # face centroid; shifting all verts leaves the Laplacian unchanged.
    lap2 = uniform_laplacian(v + 5.0, topo.edges, topo.degrees)
    np.testing.assert_allclose(lap, lap2, atol=1e-5)
    loss = laplacian_smoothing(v, topo.edges, topo.degrees)
    assert loss.shape == ()


def test_edge_lengths_sq():
    verts, faces = _tetra()
    e = edge_lengths_sq(jnp.asarray(verts), faces)
    assert e.shape == (12,)
    # face 0 edges: (0,2),(1,2),(0,1) lengths^2 = 1,2,1
    np.testing.assert_allclose(e[0], 1.0, atol=1e-6)


def test_normal_consistency_tetra():
    verts, faces = _tetra()
    pairs = normal_consistency_pairs(faces, 4)
    assert pairs.shape == (6, 4)  # every edge shared by exactly 2 faces
    loss = normal_consistency_loss(jnp.asarray(verts), pairs)
    assert float(loss) > 0  # tetra is not flat


# -------------------------------------------------------------- subdivision
def test_loop_subdivide_counts():
    verts, faces = _tetra()
    v2, f2 = loop_subdivide(verts, faces)
    assert v2.shape == (4 + 6, 3)
    assert f2.shape == (16, 3)
    # every new face references valid vertices
    assert f2.max() < v2.shape[0]


def test_loop_subdivide_four_group_layout():
    verts, faces = _tetra()
    _, f2 = loop_subdivide(verts, faces)
    g = f2.reshape(-1, 4, 3)
    for i, (a, b, c) in enumerate(faces):
        assert g[i, 0, 0] == a and g[i, 1, 1] == b and g[i, 2, 2] == c
        # corner faces share midpoints with the center face
        assert g[i, 3, 0] == g[i, 0, 1]  # m01
        assert g[i, 3, 1] == g[i, 1, 2]  # m12
        assert g[i, 3, 2] == g[i, 0, 2]  # m20


def test_loop_subdivide_smooths_toward_sphere():
    verts, faces = _tetra()
    v, f = verts, faces
    for _ in range(3):
        v, f = loop_subdivide(v, f)
    # subdivision surface of a tetra shrinks inside the original hull
    assert np.abs(v).max() <= 1.0 + 1e-6
    assert f.shape[0] == 4 * 4 ** 3


def test_subdivide_weights_partition_of_unity(rng):
    verts, faces = _tetra()
    w = rng.random((4, 5)).astype(np.float32)
    w = w / w.sum(1, keepdims=True)
    v2, f2, w2 = subdivide_weights_loop(w, verts, faces, iterations=2)
    assert w2.shape[0] == v2.shape[0]
    np.testing.assert_allclose(w2.sum(1), 1.0, atol=1e-5)


def test_boundary_preserved():
    # A single triangle: all edges are boundary; Loop must keep the
    # boundary polyline (midpoints stay on the edges).
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    v2, f2 = loop_subdivide(verts, faces)
    assert v2.shape[0] == 6
    # midpoint of boundary edge (0,1) must be (0.5, 0, 0) exactly
    mids = v2[3:]
    assert any(np.allclose(m, [0.5, 0, 0]) for m in mids)


def test_vertex_normals_incidence_matches_scatter(rng):
    # gather-only incidence path (custom_vjp) == scatter path, values AND
    # gradients, on an irregular subdivided mesh
    from fmhr_tpu.core.subdivision import loop_subdivide

    verts, faces = _tetra()
    for _ in range(3):
        verts, faces = loop_subdivide(verts, faces)
    verts = verts + rng.normal(0, 0.01, verts.shape).astype(np.float32)
    topo = MeshTopology.build(faces, verts.shape[0])
    v = jnp.asarray(verts)

    n_ref = vertex_normals(v, faces)
    n_inc = vertex_normals(v, faces, incidence=topo.vert_slot_incidence)
    np.testing.assert_allclose(n_inc, n_ref, atol=1e-5)

    cot = jnp.asarray(rng.normal(0, 1, n_ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda x: jnp.sum(vertex_normals(x, faces) * cot))(v)
    g_inc = jax.grad(lambda x: jnp.sum(
        vertex_normals(x, faces, incidence=topo.vert_slot_incidence) * cot
    ))(v)
    np.testing.assert_allclose(g_inc, g_ref, atol=1e-4)

    # batched path
    vb = jnp.stack([v, v * 1.1])
    nb = vertex_normals(vb, faces, incidence=topo.vert_slot_incidence)
    np.testing.assert_allclose(nb[0], n_ref, atol=1e-5)


def test_uniform_laplacian_incidence_matches_scatter(rng):
    from fmhr_tpu.core.subdivision import loop_subdivide

    verts, faces = _tetra()
    for _ in range(2):
        verts, faces = loop_subdivide(verts, faces)
    topo = MeshTopology.build(faces, verts.shape[0])
    v = jnp.asarray(verts + rng.normal(0, 0.01, verts.shape).astype(np.float32))

    l_ref = uniform_laplacian(v, topo.edges, topo.degrees)
    l_inc = uniform_laplacian(v, topo.edges, topo.degrees,
                              nbr_incidence=topo.nbr_incidence)
    np.testing.assert_allclose(l_inc, l_ref, atol=1e-5)

    g_ref = jax.grad(lambda x: laplacian_smoothing(
        x, topo.edges, topo.degrees))(v)
    g_inc = jax.grad(lambda x: laplacian_smoothing(
        x, topo.edges, topo.degrees,
        nbr_incidence=topo.nbr_incidence))(v)
    np.testing.assert_allclose(g_inc, g_ref, atol=1e-4)
