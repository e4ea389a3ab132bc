"""Rotation representations and articulated rigid-transform chains.

Pure-JAX, jit/vmap-friendly equivalents of the reference math
(`/root/reference/models/utils.py:66-144`, duplicated at
`/root/reference/models/smplx.py:8-85`). Numerics intentionally match the
reference formulas, including the axis-angle epsilon quirk (the reference
adds 1e-8 to every component *before* taking the norm), so that fitted
parameters are interchangeable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_matrix(quat: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) -> rotation matrix.

    Args:
      quat: [..., 4], not necessarily normalized.

    Returns:
      [..., 3, 3] rotation matrices.

    Parity: `models/utils.py:66-86` (quat2mat).
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def rodrigues(theta: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix via the half-angle quaternion.

    Args:
      theta: [..., 3] axis-angle vectors.

    Returns:
      [..., 3, 3] rotation matrices.

    Parity: `models/utils.py:88-102` (batch_rodrigues). The reference
    computes `angle = ||theta + 1e-8||` (epsilon added per-component before
    the norm) and divides the *un-shifted* theta by that angle; we replicate
    exactly so pose parameters round-trip bit-for-bit in float32.
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_matrix(quat)


def rigid_transform_chain(
    Rs: jax.Array, Js: jax.Array, parents
) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics along a joint hierarchy (LBS convention).

    Args:
      Rs: [B, J, 3, 3] per-joint local rotations.
      Js: [B, J, 3] joint locations in the rest pose.
      parents: length-J int sequence; parents[0] is ignored (root).

    Returns:
      (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]) where
      rel_transforms maps rest-pose points to posed points for each joint
      (the "A" matrices of LBS: world transform with the rest joint position
      factored out).

    Parity: `models/utils.py:105-144` (batch_global_rigid_transformation,
    rotate_base=False). The joint loop is unrolled at trace time (J is
    static, 16 for MANO), which XLA fuses into a straight-line chain.
    """
    parents = [int(p) for p in parents]
    B, J = Rs.shape[0], Rs.shape[1]

    def make_A(R, t):
        # [B,3,3],[B,3] -> [B,4,4]
        top = jnp.concatenate([R, t[:, :, None]], axis=2)
        bot = jnp.broadcast_to(
            jnp.array([[0.0, 0.0, 0.0, 1.0]], Rs.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bot], axis=1)

    results = [make_A(Rs[:, 0], Js[:, 0])]
    for i in range(1, J):
        j_rel = Js[:, i] - Js[:, parents[i]]
        A_local = make_A(Rs[:, i], j_rel)
        results.append(results[parents[i]] @ A_local)
    world = jnp.stack(results, axis=1)  # [B, J, 4, 4]

    posed_joints = world[:, :, :3, 3]
    # Subtract the transformed rest joint so A applies to rest-pose points.
    Js_h = jnp.concatenate([Js, jnp.zeros((B, J, 1), Rs.dtype)], axis=2)
    init_bone = jnp.einsum("bjkl,bjl->bjk", world, Js_h)  # [B, J, 4]
    rel = world - jnp.pad(init_bone[:, :, :, None], ((0, 0), (0, 0), (0, 0), (3, 0)))
    return posed_joints, rel


def transform_points_h(points: jax.Array, mat_T: jax.Array) -> jax.Array:
    """Apply a 4x4 transform stored TRANSPOSED (row-vector convention).

    The whole pipeline follows the reference convention of keeping
    w2c / projection matrices transposed and multiplying homogeneous
    row-vectors from the left: `p_out = [p, 1] @ M^T`
    (`mesh_sfs_optim.py:138-140`).

    Args:
      points: [..., N, 3].
      mat_T: [..., 4, 4] transposed transforms (broadcast against points).

    Returns:
      [..., N, 4] homogeneous outputs (not divided by w).
    """
    ones = jnp.ones_like(points[..., :1])
    ph = jnp.concatenate([points, ones], axis=-1)
    return ph @ mat_T
