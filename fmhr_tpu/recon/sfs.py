"""Classic single-image shape-from-shading (albedo/specular separation +
depth refinement by linearized SH shading).

TPU-native rebuild of `/root/reference/models/sfs_utils.py` (vestigial in
the reference release — no entry point reaches it — carried for full
component parity per SURVEY §1). The reference solves three large sparse
normal-equation systems with scipy `spsolve` on the CPU.

TPU mapping: mesh/stencil TOPOLOGY is host-side precompute (same policy
as the GCN hierarchy build, SURVEY §2.2): the sparse normal-equation
matrices are assembled once per frame with scipy in the reference's exact
row/column layout, converted to `jax.experimental.sparse` BCOO, and the
solves run on device as jitted conjugate-gradient iterations
(`jax.scipy.sparse.linalg.cg`) — all SPD systems (diag + λ·AᵀA). The
dense shading estimate is pure JAX.

`refine_normals` (`/root/reference/models/sfs_utils.py:273-278`) is an
unfinished fragment in the reference (no return statement, no call
sites) and is deliberately not carried.

All flattening uses column-major ('F') order to match the reference's
index spaces exactly (every mask/selection cites the matching line).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse


# Lambertian SH-lite constants (`/root/reference/models/sfs_utils.py:51`)
_C = np.array([0.429043, 0.511664, 0.743125, 0.886227])


def depth2normal(depth):
    """Per-pixel normals from a depth map via image-space gradients.
    Parity: `/root/reference/models/sfs_utils.py:10-20`."""
    zy, zx = jnp.gradient(depth)
    ones = jnp.ones_like(zx)
    normal = jnp.stack([zx, zy, -ones], axis=2)
    return normal / jnp.linalg.norm(normal, axis=2, keepdims=True)


def bgr2gray(img):
    """cv2-compatible BGR->gray (ITU-R 601), scaled from [0, 255].
    Role of `cv2.cvtColor(..., COLOR_BGR2GRAY) / 255`
    (`/root/reference/models/sfs_utils.py:57`)."""
    return (0.114 * img[..., 0] + 0.587 * img[..., 1]
            + 0.299 * img[..., 2]) / 255.0


def estimate_shading(color_im, normals, color_mask):
    """Fit a 4-coefficient lambertian lighting model to the masked pixels
    and evaluate the shading image. Fully on-device: the boolean-indexed
    least squares becomes mask-WEIGHTED normal equations (4x4 solve).

    color_im [h, w, 3] BGR in [0, 255]; normals [h, w, 3];
    color_mask [h, w] bool. Returns (M [4, 1], s [h, w], grayimg [h, w]).
    Parity: `/root/reference/models/sfs_utils.py:37-68`.
    """
    m = color_mask.astype(jnp.float64 if normals.dtype == jnp.float64
                          else jnp.float32)
    c = jnp.asarray(_C, normals.dtype)
    ones = jnp.ones_like(normals[..., 0])
    A = jnp.stack([c[1] * normals[..., 0], c[1] * normals[..., 1],
                   c[1] * normals[..., 2], c[3] * ones], axis=-1)  # [h,w,4]
    grayimg = bgr2gray(color_im.astype(A.dtype))
    Af = A.reshape(-1, 4)
    wf = m.reshape(-1)
    gf = grayimg.reshape(-1)
    AtA = (Af * wf[:, None]).T @ Af
    Atb = (Af * wf[:, None]).T @ gf
    x = jnp.linalg.solve(AtA, Atb)
    M = jnp.stack([c[1] * x[0], c[1] * x[1], c[1] * x[2],
                   c[3] * x[3]])[:, None]                         # [4, 1]
    s = (normals @ M[:3, 0] + M[3, 0]) * m
    return M, s, grayimg


def convmtx2(kernel: np.ndarray, shape) -> sp.csc_matrix:
    """2-D full-convolution matrix in column-major layout: column j
    (input pixel, 'F'-order over `shape`) scatters kernel values to
    output rows (r+i, c+k) on the (h+K-1, w+K-1) grid ('F'-order).
    Parity: `/root/reference/models/sfs_utils.py:22-34` (host-side
    topology precompute).
    """
    k = kernel.shape[0]
    assert kernel.shape[0] == kernel.shape[1]
    h, w = shape
    ho = h + k - 1
    r, c = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rf = r.flatten("F")
    cf = c.flatten("F")
    cols = np.arange(h * w).repeat(k * k)
    ki, kj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    kif = ki.flatten("F")
    kjf = kj.flatten("F")
    rows = ((rf[:, None] + kif[None]) +
            (cf[:, None] + kjf[None]) * ho).reshape(-1)
    values = np.tile(kernel.flatten("F"), h * w)
    return sp.csc_matrix((values, (rows, cols)),
                         shape=(ho * (w + k - 1), h * w))


def _cg(A_sp: sp.spmatrix, b: np.ndarray, maxiter: int = 2000,
        tol: float = 1e-10):
    """Device CG solve of the SPD scipy matrix `A_sp` against `b`."""
    A = jsparse.BCOO.from_scipy_sparse(A_sp.tocoo())
    bj = jnp.asarray(b)

    @jax.jit
    def run(bj):
        x, _ = jax.scipy.sparse.linalg.cg(
            lambda v: A @ v, bj, tol=tol, maxiter=maxiter)
        return x

    return np.asarray(run(bj))


def _neighbor_weight_mat(I, depth_map, tau_c, sigma_c, sigma_d):
    """Σ_s diag(w_s)·m_s over the 8 neighbor shifts — the bilateral
    smoothness operator of `estimate_albedo_and_specularities`
    (`/root/reference/models/sfs_utils.py:92-117`)."""
    h, w = I.shape
    Iq = np.pad(I, 1)
    Dq = np.pad(depth_map, 1)
    x, y = np.meshgrid(np.arange(w + 2), np.arange(h + 2))
    mat_idx = ((x != 0) & (x != w + 1) & (y != 0)
               & (y != h + 1)).flatten("F")
    length = h * w
    mat = None
    for r in (-1, 0, 1):
        for c in (-1, 0, 1):
            if r == 0 and c == 0:
                continue
            H = np.zeros((3, 3))
            H[r + 1, c + 1] = -1
            H[1, 1] = 1
            H = np.rot90(H, k=2)
            m = convmtx2(H, I.shape)[mat_idx, :]
            shift_Ip = Iq[r + 1:r + h + 1, c + 1:c + w + 1]
            shift_Dp = Dq[r + 1:r + h + 1, c + 1:c + w + 1]
            color_diff = (I - shift_Ip) ** 2
            depth_diff = (depth_map - shift_Dp) ** 2
            idx = (color_diff < tau_c) & (shift_Ip != 0) & (shift_Dp != 0)
            cw = np.zeros_like(I)
            cw[idx] = np.exp(-color_diff[idx] / (2 * sigma_c ** 2)
                             - depth_diff[idx] / (2 * sigma_d ** 2))
            term = sp.diags(cw.flatten("F")) @ m
            mat = term if mat is None else mat + term
    return mat


def estimate_albedo_and_specularities(shading, I, depth_map, missing_depth,
                                      missing_color, lighting_opt_params):
    """Separate the gray image into albedo ρ and additive specular β under
    the given shading, with bilateral piecewise-smoothness priors:
        (diag(s²) + λ_ρ MᵀM) ρ = s·I
        ((1+λ_β2) Id + λ_β1 MᵀM) β = I − ρ·s
    Operator assembly on host; both SPD solves on device (CG).
    Parity: `/root/reference/models/sfs_utils.py:72-161`.
    """
    h, w = I.shape
    p = lighting_opt_params
    mat = _neighbor_weight_mat(I, depth_map, p["tau_c"], p["sigma_c"],
                               p["sigma_d"])

    valid_samples = ((~missing_depth).flatten("F")
                     & (~missing_color).flatten("F"))
    mat = mat[:, valid_samples]
    row_sum = np.asarray(mat.sum(1)).squeeze()
    row_abs = np.asarray(abs(mat).sum(1)).squeeze()
    valid_neighbors = (row_sum <= 1e-6) & (row_abs != 0)
    mat = mat[valid_neighbors, :]

    s_v = shading.flatten("F")[valid_samples]
    I_v = I.flatten("F")[valid_samples]
    length = len(s_v)

    big = sp.diags(s_v ** 2) + p["lambda_rho"] * (mat.T @ mat)
    rho_v = _cg(big.tocsr(), s_v * I_v)

    rho = np.zeros(h * w)
    rho[valid_samples] = rho_v

    big2 = ((1 + p["lambda_beta2"]) * sp.eye(length)
            + p["lambda_beta1"] * (mat.T @ mat))
    beta_v = _cg(big2.tocsr(), I_v - rho_v * s_v)
    beta = np.zeros(h * w)
    beta[valid_samples] = beta_v

    return rho.reshape(h, w, order="F"), beta.reshape(h, w, order="F")


def refine_surface(z0, rho, beta, M, I, missing_color, depth_opt_params):
    """Refine the depth map so the linearized lambertian render matches
    the image: solve (WᵀW + λ_z1 Id + λ_z2 LᵀL) z = Wᵀ·const + λ_z1 z₀
    where W couples depth gradients to shading through the lighting M.
    Parity: `/root/reference/models/sfs_utils.py:165-270` (including all
    row-validity selections); the solve runs on device.
    """
    h, w = I.shape
    lambda_z1 = depth_opt_params["lambda_z1"]
    lambda_z2 = depth_opt_params["lambda_z2"]

    x, y = np.meshgrid(np.arange(w + 2), np.arange(h + 2))
    mat_idx = ((x != 0) & (x != w + 1) & (y != 0)
               & (y != h + 1)).flatten("F")

    dx = convmtx2(np.array([[0, 0, 0], [-1, 1, 0], [0, 0, 0]],
                           np.float64), (h, w))[mat_idx]
    dy = convmtx2(np.array([[0, -1, 0], [0, 1, 0], [0, 0, 0]],
                           np.float64), (h, w))[mat_idx]

    lap = convmtx2(np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]],
                            np.float64), (h, w))
    lap_abs = np.asarray(abs(lap).sum(1)).squeeze()
    valid_lap = (lap_abs != 1) & (lap_abs != 0)
    lap = lap[valid_lap]
    correction = sp.diags(np.asarray(lap.sum(1)).squeeze(), 0,
                          shape=(h * w, h * w))
    lap = lap - correction

    init_surface = z0.flatten("F")

    interior = (
        (np.asarray(dx.sum(1)).squeeze() == 0)
        & (np.asarray(dy.sum(1)).squeeze() == 0)
        & (np.asarray(abs(dx).sum(1)).squeeze() != 0)
        & (np.asarray(abs(dy).sum(1)).squeeze() != 0))
    dx = dx[interior]
    dy = dy[interior]

    valid_dxdy = ((np.abs(dx @ init_surface) < 10)
                  & (np.abs(dy @ init_surface) < 10))
    dx = dx[valid_dxdy]
    dy = dy[valid_dxdy]

    color_idx = (~missing_color).flatten("F")[interior][valid_dxdy]
    I_s = I.flatten("F")[interior][valid_dxdy][color_idx]
    rho_s = rho.flatten("F")[interior][valid_dxdy][color_idx]
    beta_s = beta.flatten("F")[interior][valid_dxdy][color_idx]
    dx = dx[color_idx]
    dy = dy[color_idx]

    lap_idx = ((np.asarray(lap.sum(1)).squeeze() == 0)
               & (np.asarray(abs(lap).sum(1)).squeeze() != 0))
    lap = lap[lap_idx]
    lap = lap[np.abs(lap @ init_surface) < 50]

    M = np.asarray(M).squeeze()
    p = dx @ init_surface
    q = dy @ init_surface
    eta = 1.0 / np.sqrt(1 + p ** 2 + q ** 2)

    W = -sp.diags(rho_s) @ sp.diags(eta) @ (M[0] * dx + M[1] * dy)
    const = -(beta_s + rho_s * (M[3] - eta * M[2]) - I_s)
    big = (W.T @ W) + lambda_z1 * sp.eye(h * w) + lambda_z2 * (lap.T @ lap)
    vec = W.T @ const + lambda_z1 * init_surface

    z = _cg(big.tocsr(), vec)
    return z.reshape(h, w, order="F")
