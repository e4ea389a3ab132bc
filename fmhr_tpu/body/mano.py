"""MANO articulated hand model — pure JAX.

A from-scratch LBS layer with the semantics the reference gets from the
`smplx` pip package (`/root/reference/get_data.py:13`,
`mano_optim.py:13`) and its in-repo re-implementation
(`/root/reference/models/smplx.py:200-378`):

  v_shaped = v_template + shapedirs · betas
  J        = J_regressor · v_shaped
  R        = rodrigues(pose)           (16 joints incl. global orient)
  v_posed  = v_shaped + posedirs · (R[1:] - I)     (pose blend shapes)
  T        = Σ_j w_vj · A_j            (A from the kinematic chain)
  verts    = T · v_posed ;  joints = chain joints  (+ translation/scale)

Hand-pose handling matches smplx: optional PCA compression
(`hand_pose @ hand_components`) and the flat-hand mean offset
(`pose = pose + pose_mean` unless flat_hand_mean).

`lbs` / `lbs_tpose` re-pose ARBITRARY vertex sets (the subdivided,
displaced HAM meshes) with subdivided skinning weights; inverse LBS maps to
the T-pose. Parity: `/root/reference/repose.py:43-99`. Like the reference,
these skip pose blend shapes (`repose.py:58-59` comments them out).

Weights/shape data come from an .npz produced by
:mod:`fmhr_tpu.body.convert` (MANO pickles are user-supplied, as in the
reference `README.md:46-48`); tests use :mod:`fmhr_tpu.body.synthetic`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rotations import rodrigues, rigid_transform_chain

# Fingertip vertex ids appended to the 16 LBS joints to form 21 keypoints.
# Parity: `mano_optim.py:218-220` (right: 444, left: 445 for the middle tip).
MANO_TIP_VERTEX_IDS = {
    "right": (745, 317, 444, 556, 673),
    "left": (745, 317, 445, 556, 673),
}

# Reorder (16 LBS joints + 5 tips) into the MediaPipe-style ordering used by
# every keypoint consumer. Parity: `mano_optim.py:225`.
MANO_JOINT_REORDER = (
    0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20
)


@dataclasses.dataclass(frozen=True)
class ManoModel:
    """Static MANO model data (one hand). All arrays numpy, float32/int32."""

    v_template: np.ndarray      # [V, 3]
    shapedirs: np.ndarray       # [V, 3, S]
    posedirs: np.ndarray        # [(J-1)*9, V*3]
    J_regressor: np.ndarray     # [J, V]
    lbs_weights: np.ndarray     # [V, J]
    parents: tuple              # length J
    faces: np.ndarray           # [F, 3] int32
    hand_mean: np.ndarray       # [(J-1)*3]
    hand_components: np.ndarray # [C, (J-1)*3] PCA basis rows
    is_rhand: bool
    # Fingertip vertex ids (thumb, index, middle, ring, pinky) for
    # joints21. None = real MANO topology -> MANO_TIP_VERTEX_IDS. Models
    # with non-MANO vertex counts (synthetic stand-ins) MUST set this:
    # the MANO ids (max 745) silently clamp out of range otherwise.
    tip_vertex_ids: tuple | None = None

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def hand_type(self) -> str:
        return "right" if self.is_rhand else "left"

    def save_npz(self, path: str) -> None:
        extra = {}
        if self.tip_vertex_ids is not None:
            extra["tip_vertex_ids"] = np.asarray(self.tip_vertex_ids,
                                                 np.int32)
        np.savez(
            path, v_template=self.v_template, shapedirs=self.shapedirs,
            posedirs=self.posedirs, J_regressor=self.J_regressor,
            lbs_weights=self.lbs_weights,
            parents=np.asarray(self.parents, np.int32), faces=self.faces,
            hand_mean=self.hand_mean, hand_components=self.hand_components,
            is_rhand=self.is_rhand, **extra,
        )

    @classmethod
    def load_npz(cls, path: str) -> "ManoModel":
        d = np.load(path)
        return cls(
            v_template=d["v_template"].astype(np.float32),
            shapedirs=d["shapedirs"].astype(np.float32),
            posedirs=d["posedirs"].astype(np.float32),
            J_regressor=d["J_regressor"].astype(np.float32),
            lbs_weights=d["lbs_weights"].astype(np.float32),
            parents=tuple(int(p) for p in d["parents"]),
            faces=d["faces"].astype(np.int32),
            hand_mean=d["hand_mean"].astype(np.float32),
            hand_components=d["hand_components"].astype(np.float32),
            is_rhand=bool(d["is_rhand"]),
            tip_vertex_ids=(tuple(int(t) for t in d["tip_vertex_ids"])
                            if "tip_vertex_ids" in d else None),
        )

    def full_pose(
        self,
        global_orient: jax.Array,
        hand_pose: jax.Array,
        use_pca: bool = False,
        flat_hand_mean: bool = False,
    ) -> jax.Array:
        """[B, 3] + [B, 45|C] -> [B, J*3] axis-angle pose."""
        if use_pca:
            hand_pose = hand_pose @ jnp.asarray(
                self.hand_components[: hand_pose.shape[-1]]
            )
        if not flat_hand_mean:
            hand_pose = hand_pose + jnp.asarray(self.hand_mean)
        return jnp.concatenate([global_orient, hand_pose], axis=-1)


def _skinning_transforms(model: ManoModel, pose: jax.Array, betas: jax.Array):
    """Shared core: returns (v_shaped, v_posed, joints_rest, A, T)."""
    B = pose.shape[0]
    V = model.num_vertices
    J = model.num_joints

    shapedirs = jnp.asarray(model.shapedirs).reshape(V * 3, -1)  # [V3, S]
    v_shaped = (
        jnp.asarray(model.v_template)[None]
        + (betas @ shapedirs.T).reshape(B, V, 3)
    )
    joints_rest = jnp.einsum("bvk,jv->bjk", v_shaped, jnp.asarray(model.J_regressor))

    R = rodrigues(pose.reshape(B * J, 3)).reshape(B, J, 3, 3)
    posed_joints, A = rigid_transform_chain(R, joints_rest, model.parents)

    W = jnp.asarray(model.lbs_weights)  # [V, J]
    T = jnp.einsum("vj,bjkl->bvkl", W, A)  # [B, V, 4, 4]
    return v_shaped, R, posed_joints, A, T


def mano_forward(
    model: ManoModel,
    global_orient: jax.Array,
    hand_pose: jax.Array,
    betas: jax.Array,
    transl: Optional[jax.Array] = None,
    scale=1.0,
    use_pca: bool = False,
    flat_hand_mean: bool = False,
    apply_pose_blend: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Full MANO forward. Returns (vertices [B,V,3], joints [B,16,3]).

    Parity: smplx MANO layer as used at `get_data.py:176` /
    `mano_optim.py:213-215`; math per `models/smplx.py:292-339`.
    """
    pose = model.full_pose(global_orient, hand_pose, use_pca, flat_hand_mean)
    B = pose.shape[0]
    J = model.num_joints
    pose = pose.reshape(B, J, 3)

    v_shaped, R, posed_joints, A, T = _skinning_transforms(model, pose, betas)

    v_posed = v_shaped
    if apply_pose_blend:
        eye = jnp.eye(3, dtype=R.dtype)
        lrotmin = (R[:, 1:] - eye).reshape(B, -1)  # [B, (J-1)*9]
        v_posed = v_posed + (lrotmin @ jnp.asarray(model.posedirs)).reshape(
            B, model.num_vertices, 3
        )

    ones = jnp.ones((B, v_posed.shape[1], 1), v_posed.dtype)
    v_h = jnp.concatenate([v_posed, ones], axis=2)
    verts = jnp.einsum("bvkl,bvl->bvk", T, v_h)[..., :3]

    if transl is not None:
        t = transl[:, None, :] if transl.ndim == 2 else transl
        verts = verts * scale + t
        posed_joints = posed_joints * scale + t
    return verts, posed_joints


def joints21(
    model: ManoModel, verts: jax.Array, joints16: jax.Array
) -> jax.Array:
    """16 LBS joints + 5 tip vertices, reordered to the 21-keypoint layout.

    Parity: `mano_optim.py:212-227` (mano_forward). NOTE scale/translation
    must already be applied consistently to verts and joints16.
    """
    tip_ids = (model.tip_vertex_ids if model.tip_vertex_ids is not None
               else MANO_TIP_VERTEX_IDS[model.hand_type])
    tips = verts[:, jnp.asarray(tip_ids)]
    j = jnp.concatenate([joints16, tips], axis=1)
    return j[:, jnp.asarray(MANO_JOINT_REORDER)]


def lbs(
    model: ManoModel,
    pose: jax.Array,
    shape: jax.Array,
    weights: jax.Array,
    verts_tpose: jax.Array,
    add_pose_mean: bool = True,
) -> jax.Array:
    """Forward-skin arbitrary T-pose vertices with given weights.

    pose: [B, J*3] axis-angle (global orient included); weights: [Vn, J]
    (e.g. subdivided weights); verts_tpose: [B, Vn, 3].
    Parity: `repose.py:43-70`. The reference mutates `pose += pose_mean`
    in place (`repose.py:54`) — here expressed functionally via
    `add_pose_mean` (the mean applies to the 45 hand-pose dims only).
    """
    B = pose.shape[0]
    J = model.num_joints
    if add_pose_mean:
        mean = jnp.concatenate(
            [jnp.zeros(3, pose.dtype), jnp.asarray(model.hand_mean)]
        )
        pose = pose + mean
    pose = pose.reshape(B, J, 3)

    _, _, _, A, _ = _skinning_transforms(model, pose, shape)
    T = jnp.einsum("vj,bjkl->bvkl", jnp.asarray(weights), A)

    ones = jnp.ones((B, verts_tpose.shape[1], 1), verts_tpose.dtype)
    v_h = jnp.concatenate([verts_tpose, ones], axis=2)
    return jnp.einsum("bvkl,bvl->bvk", T, v_h)[..., :3]


def lbs_tpose(
    model: ManoModel,
    pose: jax.Array,
    shape: jax.Array,
    weights: jax.Array,
    verts: jax.Array,
    add_pose_mean: bool = True,
) -> jax.Array:
    """Inverse LBS: map posed vertices back to the T-pose.

    Parity: `repose.py:72-99` (`inverse(T) @ verts`).
    """
    B = pose.shape[0]
    J = model.num_joints
    if add_pose_mean:
        mean = jnp.concatenate(
            [jnp.zeros(3, pose.dtype), jnp.asarray(model.hand_mean)]
        )
        pose = pose + mean
    pose = pose.reshape(B, J, 3)

    _, _, _, A, _ = _skinning_transforms(model, pose, shape)
    T = jnp.einsum("vj,bjkl->bvkl", jnp.asarray(weights), A)
    T_inv = jnp.linalg.inv(T)

    ones = jnp.ones((B, verts.shape[1], 1), verts.dtype)
    v_h = jnp.concatenate([verts, ones], axis=2)
    return jnp.einsum("bvkl,bvl->bvk", T_inv, v_h)[..., :3]
