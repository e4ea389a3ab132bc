"""Spherical-harmonic shading.

Two bases are provided:

- `sh_basis` / `sh_radiance`: the reference's NON-standard degree<=3 basis
  WITHOUT the SH normalization constants
  (`/root/reference/models/utils.py:188-226`). This is the basis the HAM
  optimizer fits lighting in, so we reproduce it exactly for parity.
- `eval_sh`: the standard real SH evaluation up to degree 4
  (`models/utils.py:229-302`), kept for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sh_basis(normal: jax.Array, degree: int = 3) -> jax.Array:
    """Reference SH basis matrix. normal: [..., 3] -> [..., degree**2].

    Parity: `models/utils.py:188-206` (get_matrix). Column order:
    1, ny, nz, nx, nx*ny, ny*nz, (2nz²-nx²-ny²), nz*nx, (nx²-ny²).
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    cols = [jnp.ones_like(nx)]
    if degree > 1:
        cols += [ny, nz, nx]
    if degree > 2:
        cols += [
            nx * ny,
            ny * nz,
            2.0 * nz * nz - nx * nx - ny * ny,
            nz * nx,
            nx * nx - ny * ny,
        ]
    return jnp.stack(cols, axis=-1)


def sh_radiance(coeff: jax.Array, normal: jax.Array, degree: int = 3,
                axis: int = -1) -> jax.Array:
    """Scalar radiance from SH coefficients and unit normals.

    coeff: [..., degree**2] (broadcastable against normal[..., 0]);
    normal: [..., 3]. Parity: `models/utils.py:208-226` (get_radiance).

    `axis` selects the normal-component axis: the tiled training layout
    keeps channels on a middle axis ([B, T, 3, P]) so moving them to the
    last axis would be a relayout; with axis != -1 the basis columns are
    combined without ever stacking (coeff[..., i] must broadcast against
    normal with `axis` removed).
    """
    if axis == -1:
        basis = sh_basis(normal, degree)  # [..., degree**2]
        return jnp.sum(coeff * basis, axis=-1)
    nx = jax.lax.index_in_dim(normal, 0, axis, keepdims=False)
    ny = jax.lax.index_in_dim(normal, 1, axis, keepdims=False)
    nz = jax.lax.index_in_dim(normal, 2, axis, keepdims=False)
    cols = [jnp.ones_like(nx)]
    if degree > 1:
        cols += [ny, nz, nx]
    if degree > 2:
        cols += [
            nx * ny,
            ny * nz,
            2.0 * nz * nz - nx * nx - ny * ny,
            nz * nx,
            nx * nx - ny * ny,
        ]
    out = None
    for i, c in enumerate(cols):
        term = coeff[..., i] * c
        out = term if out is None else out + term
    return out


# Standard real SH constants (degree 0..4).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """Standard real-SH evaluation, deg<=4.

    sh: [..., C, (deg+1)**2]; dirs: [..., 3] broadcastable.
    Parity: `models/utils.py:229-302`.
    """
    result = _C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - _C1 * y * sh[..., 1] + _C1 * z * sh[..., 2] - _C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + _C2[0] * xy * sh[..., 4]
                      + _C2[1] * yz * sh[..., 5]
                      + _C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + _C2[3] * xz * sh[..., 7]
                      + _C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result
                          + _C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + _C3[1] * xy * z * sh[..., 10]
                          + _C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + _C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + _C3[5] * z * (xx - yy) * sh[..., 14]
                          + _C3[6] * x * (xx - 3 * yy) * sh[..., 15])
                if deg > 3:
                    result = (result
                              + _C4[0] * xy * (xx - yy) * sh[..., 16]
                              + _C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                              + _C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                              + _C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                              + _C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                              + _C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                              + _C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                              + _C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                              + _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[..., 24])
    return result
