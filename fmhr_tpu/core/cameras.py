"""Camera model: projection-matrix decomposition and the NDC convention.

Host-side (NumPy) camera preprocessing equivalent to the reference loaders:

- `decompose_projection` replaces `cv2.decomposeProjectionMatrix`
  (`/root/reference/models/utils.py:29-47`) with a self-contained RQ
  decomposition, validated against OpenCV in the tests.
- `ndc_projection` applies the reference's OpenGL-style fixup
  (`/root/reference/get_data.py:66-73`): x/y focal/principal scaled to
  [-1, 1]; proj[2,2]=0, proj[2,3]=-0.1, proj[3,2]=1 so clip w equals the
  view-space depth and clip z is the constant -0.1 (depth buffer value
  -0.1 / z_view, monotone in depth for points in front of the camera).
- Matrices are returned TRANSPOSED (`get_data.py:96-97`): all device code
  multiplies homogeneous row-vectors from the left.

Ray helpers mirror `/root/reference/models/get_rays.py:9-37` (camera looks
down -z, y up in ray space).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _rq3(M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RQ decomposition of a 3x3 matrix: M = R_up @ Q with R_up upper
    triangular and Q orthonormal. Built on QR of the flipped transpose."""
    P = np.fliplr(np.eye(3))
    q, r = np.linalg.qr((P @ M).T)
    R_up = P @ r.T @ P
    Q = P @ q.T
    return R_up, Q


def decompose_projection(P: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection into intrinsics K, rotation R, center C.

    Matches the conventions of cv2.decomposeProjectionMatrix: K has a
    positive diagonal, R is the world->camera rotation, and C is the camera
    center in world coordinates (the null space of P).
    """
    M = P[:3, :3]
    K, R = _rq3(M)
    # Force positive diagonal on K by flipping matched columns/rows.
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1.0
    S = np.diag(signs)
    K = K @ S
    R = S @ R
    # Camera center: right null vector of P.
    _, _, vt = np.linalg.svd(P)
    C = vt[-1]
    C = C[:3] / C[3]
    return K, R, C


def load_K_Rt_from_P(P: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """K (4x4, normalized so K[2,2]=1) and world->camera pose from 3x4 P.

    Parity: `models/utils.py:29-47`. Returns (intrinsics, w2c), both 4x4
    float32, not transposed.
    """
    K, R, C = decompose_projection(np.asarray(P, np.float64))
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K

    c2w = np.eye(4)
    c2w[:3, :3] = R.T
    c2w[:3, 3] = C
    w2c = np.linalg.inv(c2w)
    return intrinsics.astype(np.float32), w2c.astype(np.float32)


def ndc_projection(intrinsics: np.ndarray, width: int, height: int) -> np.ndarray:
    """The reference's OpenGL-style NDC projection fixup.

    Parity: `get_data.py:66-73`. Takes the 4x4 intrinsics from
    `load_K_Rt_from_P` and returns the 4x4 clip-space projection:
      x_clip = (fx x + cx z)/ (W/2) - z ... expressed via matrix entries,
      z_clip = -0.1 (constant), w_clip = z_view.
    """
    proj = np.array(intrinsics, np.float32).copy()
    proj[0, 0] = proj[0, 0] / (width / 2.0)
    proj[0, 2] = proj[0, 2] / (width / 2.0) - 1.0
    proj[1, 1] = proj[1, 1] / (height / 2.0)
    proj[1, 2] = proj[1, 2] / (height / 2.0) - 1.0
    proj[2, 2] = 0.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    proj[3, 3] = 0.0
    return proj


def camera_matrices_from_P(
    P: np.ndarray, width: int, height: int
) -> tuple[np.ndarray, np.ndarray]:
    """3x4 projection -> (w2c_T, proj_T), both transposed for row-vector use.

    Equivalent to the per-view block of `get_data.py:62-76,96-97`.
    """
    intr, w2c = load_K_Rt_from_P(P)
    proj = ndc_projection(intr, width, height)
    return w2c.T.astype(np.float32), proj.T.astype(np.float32)


def get_ray_directions(
    H: int, W: int, fx: float, fy: float, cx: float, cy: float
) -> np.ndarray:
    """Per-pixel ray directions in camera space, [H, W, 3].

    Parity: `models/get_rays.py:9-24`: pixel centers at +0.5, camera looks
    down -z with y flipped.
    """
    xs = np.linspace(0.5, W - 0.5, W, dtype=np.float32)
    ys = np.linspace(0.5, H - 0.5, H, dtype=np.float32)
    j, i = np.meshgrid(ys, xs, indexing="ij")
    dirs = np.stack([(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1)
    return dirs


def get_rays(directions: np.ndarray, c2w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rotate camera-space directions to world space and normalize.

    Parity: `models/get_rays.py:27-37`. NOTE the reference multiplies by
    c2w[:3,:3] WITHOUT transposing (`directions @ c2w[:3, :3]`) — a quirk we
    replicate because trained renderers consume these exact values.

    Returns (rays_d [N,3] normalized, rays_o [N,3]).
    """
    rays_d = directions @ c2w[:3, :3]
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_d.reshape(-1, 3), rays_o.reshape(-1, 3)


def project_points(points, w2c_T, proj_T):
    """Project world points with transposed matrices (device-side, JAX).

    points: [B?, N, 3]; w2c_T/proj_T: [B?, 4, 4]. Returns clip-space
    homogeneous coords [B?, N, 4] (x, y, z, w) with w = view depth.
    Parity: the einsum pair at `mesh_sfs_optim.py:139-140`.
    """
    ones = jnp.ones_like(points[..., :1])
    ph = jnp.concatenate([points, ones], axis=-1)
    return (ph @ w2c_T) @ proj_T
