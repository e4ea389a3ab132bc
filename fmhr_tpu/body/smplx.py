"""SMPL-X full-body model — pure JAX.

Completes the body half of the reference's in-repo layer
(`/root/reference/models/smplx.py:200-378`): shape+expression blend
shapes, pose blend shapes, 55-joint kinematic chain, LBS, PCA hand pose
embedded in the full-body pose vector, extra keypoints by vertex id,
static facial landmarks by (face, barycentric) embedding, and the
dynamic face-contour landmark table indexed by the neck's y-rotation
(`models/smplx.py:119-197`). The optional edge-midpoint subdivision with
`delta`/`delta2` displacements (`models/smplx.py:341-345`) is carried
too.

The LBS core is shared with :mod:`fmhr_tpu.body.mano`
(`rigid_transform_chain`); this module only adds the body-specific
parameter layout and the landmark machinery. No reference workload
invokes the body path (every entry point is MANO), so tests run on the
synthetic body model from :mod:`fmhr_tpu.body.synthetic`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rotations import rodrigues, rigid_transform_chain

# Keypoint vertex ids of the official SMPL-X template (model data
# constants, `/root/reference/models/smplx.py:87-108`): 5 face, 6 feet,
# 10 fingertips — appended to the 55 chain joints.
SMPLX_VERTEX_IDS = {
    "nose": 9120, "reye": 9929, "leye": 9448, "rear": 616, "lear": 6,
    "rthumb": 8079, "rindex": 7669, "rmiddle": 7794, "rring": 7905,
    "rpinky": 8022, "lthumb": 5361, "lindex": 4933, "lmiddle": 5058,
    "lring": 5169, "lpinky": 5286, "LBigToe": 5770, "LSmallToe": 5780,
    "LHeel": 8846, "RBigToe": 8463, "RSmallToe": 8474, "RHeel": 8635,
}

_EXTRA_ID_ORDER = (
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
)

# Neck joint driving the dynamic face contour (`models/smplx.py:289`).
NECK_JOINT = 12


def find_joint_kin_chain(joint_id: int, parents) -> tuple:
    """Joint ids from `joint_id` up to the root (inclusive).

    Parity: `models/smplx.py:111-117`.
    """
    chain = []
    cur = int(joint_id)
    while cur >= 0:
        chain.append(cur)
        nxt = int(parents[cur])
        if nxt == cur:  # self-parented root convention
            break
        cur = nxt
    return tuple(chain)


@dataclasses.dataclass(frozen=True)
class SmplxModel:
    """Static SMPL-X model data. All arrays numpy float32/int32.

    Shape-generic: V/J/S are whatever the arrays say, so the synthetic
    test model (tiny) and the official model (10475 verts, 55 joints)
    go through identical code.
    """

    v_template: np.ndarray       # [V, 3]
    shapedirs: np.ndarray        # [V, 3, S] (betas + expression concat)
    posedirs: np.ndarray         # [(J-1)*9, V*3]
    J_regressor: np.ndarray      # [J, V]
    lbs_weights: np.ndarray      # [V, J]
    parents: tuple               # length J, parents[0] == -1
    faces: np.ndarray            # [F, 3] int32
    left_hand_components: np.ndarray   # [C, 45] PCA basis rows
    right_hand_components: np.ndarray  # [C, 45]
    left_hand_mean: np.ndarray   # [45]
    right_hand_mean: np.ndarray  # [45]
    extra_joints_idxs: np.ndarray      # [E] int32 vertex ids
    lmk_faces_idx: np.ndarray    # [L] int32 static landmark faces
    lmk_bary_coords: np.ndarray  # [L, 3]
    dynamic_lmk_faces_idx: np.ndarray   # [79, Ld] int32 (contour LUT)
    dynamic_lmk_bary_coords: np.ndarray  # [79, Ld, 3]

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_hand_pca(self) -> int:
        return self.left_hand_components.shape[0]

    @property
    def pose_mean(self) -> np.ndarray:
        """[J*3] flat-hand-mean pose: zeros except the two hand blocks.

        Layout (`models/smplx.py:266-267`): :3 global, 3:66 body,
        66:69 jaw, 69:72 leye, 72:75 reye, 75:120 lhand, 120:165 rhand
        (proportionally for smaller synthetic models: the last two 45-dim
        blocks are the hands).
        """
        J = self.num_joints
        mean = np.zeros(J * 3, np.float32)
        nh = self.left_hand_mean.shape[0]
        mean[-2 * nh:-nh] = self.left_hand_mean
        mean[-nh:] = self.right_hand_mean
        return mean

    def save_npz(self, path: str) -> None:
        np.savez(path, **{f.name: np.asarray(getattr(self, f.name))
                          for f in dataclasses.fields(self)})

    @classmethod
    def load_npz(cls, path: str) -> "SmplxModel":
        d = np.load(path)
        kw = {}
        for f in dataclasses.fields(cls):
            a = d[f.name]
            if f.name == "parents":
                kw[f.name] = tuple(int(p) for p in a)
            elif a.dtype.kind in "iu":
                kw[f.name] = a.astype(np.int32)
            else:
                kw[f.name] = a.astype(np.float32)
        return cls(**kw)


def full_body_pose(
    model: SmplxModel,
    part_pose: jax.Array,
    left_hand: jax.Array,
    right_hand: jax.Array,
    use_pca: bool = True,
    flat_hand_mean: bool = False,
) -> jax.Array:
    """Assemble the flat [B, J*3] pose from body parts + hand poses.

    part_pose: [B, (J-2*15)*3] (global+body+jaw+eyes); hands either PCA
    coefficients [B, C] (use_pca) or full axis-angle [B, 45].
    Parity: `models/smplx.py:309-319` (pose_mean added only on the PCA
    path, exactly like the reference).
    """
    if use_pca:
        left_hand = left_hand @ jnp.asarray(model.left_hand_components)
        right_hand = right_hand @ jnp.asarray(model.right_hand_components)
        pose = jnp.concatenate([part_pose, left_hand, right_hand], axis=-1)
        if not flat_hand_mean:
            pose = pose + jnp.asarray(model.pose_mean)
        return pose
    return jnp.concatenate([part_pose, left_hand, right_hand], axis=-1)


def _rot_mat_to_euler_y(rot):
    """y rotation angle extraction, `models/smplx.py:191-197`."""
    sy = jnp.sqrt(rot[:, 0, 0] ** 2 + rot[:, 1, 0] ** 2)
    return jnp.arctan2(-rot[:, 2, 0], sy)


def dynamic_lmk_index(model: SmplxModel, R: jax.Array) -> jax.Array:
    """Neck-y-rotation bucket into the 79-row contour LUT.

    R: [B, J, 3, 3] joint rotations. Returns [B] int32 row index.
    Parity: `models/smplx.py:119-189` (clamp to 39°, negative angles map
    to rows 40..78, beyond -39° saturates at row 78).
    """
    chain = find_joint_kin_chain(min(NECK_JOINT, model.num_joints - 1),
                                 model.parents)
    rel = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype),
                           (R.shape[0], 3, 3))
    for idx in chain:
        rel = R[:, idx] @ rel
    ang = jnp.round(jnp.clip(
        -_rot_mat_to_euler_y(rel) * (180.0 / np.pi), max=39)
    ).astype(jnp.int32)
    neg = ang < 0
    beyond = ang < -39
    neg_vals = jnp.where(beyond, 78, 39 - ang)
    return jnp.where(neg, neg_vals, ang)


def smplx_forward(
    model: SmplxModel,
    pose: jax.Array,
    shape: jax.Array,
    delta: Optional[jax.Array] = None,
    trans: Optional[jax.Array] = None,
    scale=1.0,
    edge_unique: Optional[jax.Array] = None,
    delta2: Optional[jax.Array] = None,
    use_face_contour: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Full SMPL-X forward. Returns (verts [B,V,3], joints [B,J+E+L,3]).

    pose: [B, J*3] axis-angle (use `full_body_pose` for the PCA layout)
    or [B, J, 3, 3] rotation matrices; shape: [B, S] betas(+expression).
    `edge_unique` [En, 2] appends edge-midpoint vertices displaced by
    `delta2` (the reference's on-the-fly subdivision,
    `models/smplx.py:341-345`). Parity: `models/smplx.py:292-378`.
    """
    B = pose.shape[0]
    V = model.num_vertices
    J = model.num_joints

    shapedirs = jnp.asarray(model.shapedirs).reshape(V * 3, -1)
    v_shaped = (jnp.asarray(model.v_template)[None]
                + (shape @ shapedirs.T).reshape(B, V, 3))
    joints_rest = jnp.einsum("bvk,jv->bjk", v_shaped,
                             jnp.asarray(model.J_regressor))

    if pose.ndim == 2:
        R = rodrigues(pose.reshape(B * J, 3)).reshape(B, J, 3, 3)
    elif pose.ndim == 4:
        R = pose
    else:
        raise ValueError(f"pose must be [B, J*3] or [B, J, 3, 3], "
                         f"got ndim={pose.ndim}")

    eye = jnp.eye(3, dtype=R.dtype)
    lrotmin = (R[:, 1:] - eye).reshape(B, -1)
    v_posed = v_shaped + (lrotmin @ jnp.asarray(model.posedirs)).reshape(
        B, V, 3)
    if delta is not None:
        v_posed = v_posed + delta

    posed_joints, A = rigid_transform_chain(R, joints_rest, model.parents)
    W = jnp.asarray(model.lbs_weights)
    T = jnp.einsum("vj,bjkl->bvkl", W, A)

    ones = jnp.ones((B, V, 1), v_posed.dtype)
    v_h = jnp.concatenate([v_posed, ones], axis=2)
    verts = jnp.einsum("bvkl,bvl->bvk", T, v_h)[..., :3]

    if edge_unique is not None:
        new_verts = jnp.mean(verts[:, jnp.asarray(edge_unique)], axis=2)
        verts = jnp.concatenate([verts, new_verts], axis=1)
        if delta2 is not None:
            verts = verts + delta2

    if trans is not None:
        t = trans[:, None, :] if trans.ndim == 2 else trans
        verts = verts * scale + t
        posed_joints = posed_joints + t

    # extra keypoints + facial landmarks (`models/smplx.py:354-373`)
    extra = verts[:, jnp.asarray(model.extra_joints_idxs)]
    joints = jnp.concatenate([posed_joints, extra], axis=1)

    lmk_faces_idx = jnp.broadcast_to(
        jnp.asarray(model.lmk_faces_idx)[None], (B,) + model.lmk_faces_idx.shape)
    lmk_bary = jnp.broadcast_to(
        jnp.asarray(model.lmk_bary_coords)[None],
        (B,) + model.lmk_bary_coords.shape)
    if use_face_contour and model.dynamic_lmk_faces_idx.size:
        row = dynamic_lmk_index(model, R)                        # [B]
        dyn_faces = jnp.asarray(model.dynamic_lmk_faces_idx)[row]
        dyn_bary = jnp.asarray(model.dynamic_lmk_bary_coords)[row]
        lmk_faces_idx = jnp.concatenate([lmk_faces_idx, dyn_faces], axis=1)
        lmk_bary = jnp.concatenate([lmk_bary, dyn_bary], axis=1)

    faces_j = jnp.asarray(model.faces)
    lmk_tris = faces_j[lmk_faces_idx]                            # [B, L, 3]
    lmk_verts = jnp.take_along_axis(
        verts[:, :, None, :], lmk_tris[..., None], axis=1)       # [B, L, 3, 3]
    landmarks = jnp.einsum("blfi,blf->bli", lmk_verts, lmk_bary)
    joints = jnp.concatenate([joints, landmarks], axis=1)
    return verts, joints
