"""SMPL-X body path (`fmhr_tpu.body.smplx`) on the synthetic body model.

The reference's body machinery (`/root/reference/models/smplx.py:200-378`)
is never reached by a shipped workload, so the oracle here is the math
itself: landmark embeddings must land on the mesh, rigid motions must act
equivariantly, the PCA hand path must equal the expanded-pose path, and
the dynamic-contour LUT bucketing must follow the reference's clamping
rules exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fmhr_tpu.body.synthetic import synthetic_body_model
from fmhr_tpu.body.smplx import (
    SmplxModel, smplx_forward, full_body_pose, dynamic_lmk_index,
    find_joint_kin_chain)
from fmhr_tpu.core.rotations import rodrigues


@pytest.fixture(scope="module")
def model():
    return synthetic_body_model()


def _pose(model, rng, scale=0.1):
    J = model.num_joints
    return jnp.asarray(rng.normal(size=(2, J * 3)) * scale, jnp.float32)


def test_forward_shapes_and_landmarks_on_mesh(model):
    rng = np.random.default_rng(0)
    pose = _pose(model, rng)
    shape = jnp.asarray(rng.normal(size=(2, 8)) * 0.3, jnp.float32)
    verts, joints = smplx_forward(model, pose, shape)
    J, E = model.num_joints, model.extra_joints_idxs.shape[0]
    L = model.lmk_faces_idx.shape[0]
    Ld = model.dynamic_lmk_faces_idx.shape[1]
    assert verts.shape == (2, model.num_vertices, 3)
    assert joints.shape == (2, J + E + L + Ld, 3)
    assert np.isfinite(np.asarray(verts)).all()
    assert np.isfinite(np.asarray(joints)).all()

    # extra joints are literally mesh vertices
    np.testing.assert_allclose(
        np.asarray(joints[:, J:J + E]),
        np.asarray(verts[:, model.extra_joints_idxs]), atol=1e-6)

    # static landmarks = barycentric combos of their face's vertices ->
    # they lie inside the triangle's convex hull
    lmk = np.asarray(joints[:, J + E:J + E + L])
    tris = np.asarray(verts)[:, model.faces[model.lmk_faces_idx]]  # [B,L,3,3]
    lo = tris.min(axis=2) - 1e-5
    hi = tris.max(axis=2) + 1e-5
    assert (lmk >= lo).all() and (lmk <= hi).all()


def test_rigid_equivariance(model):
    """Global rotation of the root acts as a rotation on verts/joints."""
    rng = np.random.default_rng(1)
    J = model.num_joints
    pose = jnp.zeros((1, J * 3), jnp.float32)
    shape = jnp.asarray(rng.normal(size=(1, 8)) * 0.2, jnp.float32)
    aa = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float32)
    pose_rot = pose.at[:, :3].set(aa)

    v0, j0 = smplx_forward(model, pose, shape, use_face_contour=False)
    v1, j1 = smplx_forward(model, pose_rot, shape, use_face_contour=False)
    R = np.asarray(rodrigues(aa))[0]
    c = np.asarray(j0)[0, 0]  # root rotation pivots about the root joint
    np.testing.assert_allclose(
        np.asarray(v1)[0], (np.asarray(v0)[0] - c) @ R.T + c, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j1)[0], (np.asarray(j0)[0] - c) @ R.T + c, atol=1e-4)


def test_pca_matches_expanded(model):
    rng = np.random.default_rng(2)
    J = model.num_joints
    nh = model.left_hand_mean.shape[0]
    body_dims = J * 3 - 2 * nh
    part = jnp.asarray(rng.normal(size=(2, body_dims)) * 0.1, jnp.float32)
    cl = jnp.asarray(rng.normal(size=(2, nh)) * 0.3, jnp.float32)
    cr = jnp.asarray(rng.normal(size=(2, nh)) * 0.3, jnp.float32)
    shape = jnp.zeros((2, 8), jnp.float32)

    pose_pca = full_body_pose(model, part, cl, cr, use_pca=True)
    lh = cl @ jnp.asarray(model.left_hand_components) + model.left_hand_mean
    rh = cr @ jnp.asarray(model.right_hand_components) + model.right_hand_mean
    pose_full = jnp.concatenate([part, lh, rh], axis=-1)
    np.testing.assert_allclose(np.asarray(pose_pca), np.asarray(pose_full),
                               atol=1e-6)

    v0, _ = smplx_forward(model, pose_pca, shape)
    v1, _ = smplx_forward(model, pose_full, shape)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)


def test_rotmat_pose_input(model):
    rng = np.random.default_rng(3)
    J = model.num_joints
    pose = _pose(model, rng)
    shape = jnp.zeros((2, 8), jnp.float32)
    R = rodrigues(pose.reshape(2 * J, 3)).reshape(2, J, 3, 3)
    v_aa, j_aa = smplx_forward(model, pose, shape)
    v_R, j_R = smplx_forward(model, R, shape)
    np.testing.assert_allclose(np.asarray(v_aa), np.asarray(v_R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_aa), np.asarray(j_R), atol=1e-5)


def test_subdivision_and_trans(model):
    rng = np.random.default_rng(4)
    J = model.num_joints
    pose = _pose(model, rng)
    shape = jnp.zeros((2, 8), jnp.float32)
    edges = jnp.asarray([[0, 1], [2, 3], [10, 20]], jnp.int32)
    d2 = jnp.asarray(
        rng.normal(size=(2, model.num_vertices + 3, 3)) * 0.01, jnp.float32)
    trans = jnp.asarray([[0.5, 0.0, -0.2], [0.0, 1.0, 0.0]], jnp.float32)

    v, _ = smplx_forward(model, pose, shape, edge_unique=edges, delta2=d2,
                         trans=trans, scale=2.0)
    assert v.shape == (2, model.num_vertices + 3, 3)
    # midpoint rule (`models/smplx.py:342`): new = mean of edge ends
    v_plain, _ = smplx_forward(model, pose, shape)
    mid = (np.asarray(v_plain)[:, [0, 2, 10]]
           + np.asarray(v_plain)[:, [1, 3, 20]]) / 2
    expect = (np.asarray(v_plain[:, :1]) * 0 + mid + np.asarray(
        d2[:, model.num_vertices:])) * 2.0 + np.asarray(trans)[:, None]
    got = np.asarray(v[:, model.num_vertices:])
    np.testing.assert_allclose(got, expect.reshape(got.shape), atol=1e-5)


def test_dynamic_lmk_bucketing(model):
    """Reference clamping (`models/smplx.py:175-182`): positive y angles
    clamp at 39; negative map to 39-angle (rows 40..78), saturating 78."""
    J = model.num_joints
    chain = find_joint_kin_chain(min(12, J - 1), model.parents)
    assert chain[-1] == 0  # walks to the root

    def pose_with_y(angle_deg):
        # apply the full y rotation at the chain's first joint
        pose = np.zeros((1, J, 3), np.float32)
        pose[0, chain[0], 1] = np.deg2rad(angle_deg)
        return jnp.asarray(pose.reshape(1, J * 3))

    for angle, row in [(0, 0), (-20, 20), (-39, 39), (-60, 39),
                       (20, 39 - (-20)), (39, 78), (60, 78)]:
        # note: y_rot_angle = round(clamp(-euler_y deg, max 39))
        pose = pose_with_y(angle)
        R = rodrigues(pose.reshape(J, 3)).reshape(1, J, 3, 3)
        got = int(dynamic_lmk_index(model, R)[0])
        assert got == row, (angle, got, row)


def test_npz_roundtrip(model, tmp_path):
    p = str(tmp_path / "body.npz")
    model.save_npz(p)
    m2 = SmplxModel.load_npz(p)
    rng = np.random.default_rng(5)
    pose = _pose(model, rng)
    shape = jnp.asarray(rng.normal(size=(2, 8)) * 0.2, jnp.float32)
    v1, j1 = smplx_forward(model, pose, shape)
    v2, j2 = smplx_forward(m2, pose, shape)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-6)
