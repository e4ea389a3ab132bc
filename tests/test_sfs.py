"""Classic shape-from-shading: convolution-matrix layout, lighting fit,
albedo/specular separation, and depth refinement (device CG vs direct
sparse solves)."""

import numpy as np
import scipy.sparse as sp
import scipy.signal
from scipy.sparse.linalg import spsolve
import jax.numpy as jnp

from fmhr_tpu.recon.sfs import (
    depth2normal, bgr2gray, convmtx2, estimate_shading,
    estimate_albedo_and_specularities, refine_surface,
    _neighbor_weight_mat,
)

_C = np.array([0.429043, 0.511664, 0.743125, 0.886227])


def test_convmtx2_matches_full_convolution():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(3, 3))
    x = rng.normal(size=(5, 4))
    M = convmtx2(k, x.shape)
    got = (M @ x.flatten("F")).reshape(7, 6, order="F")
    want = scipy.signal.convolve2d(x, k, "full")
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_depth2normal_flat_and_ramp():
    flat = jnp.zeros((6, 6))
    n = np.asarray(depth2normal(flat))
    np.testing.assert_allclose(n[..., :2], 0.0, atol=1e-7)
    np.testing.assert_allclose(n[..., 2], -1.0, atol=1e-7)
    ramp = jnp.arange(6.0)[None, :] * jnp.ones((6, 1))  # dz/dx = 1
    n = np.asarray(depth2normal(ramp))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(n[2, 2], [1, 0, -1] / np.sqrt(2), atol=1e-6)


def test_estimate_shading_recovers_lighting():
    rng = np.random.default_rng(1)
    h, w = 16, 14
    nrm = rng.normal(size=(h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    x_true = np.array([0.3, -0.2, 0.5, 0.9])
    gray = (_C[1] * (nrm @ x_true[:3]) + _C[3] * x_true[3])
    img = np.repeat((gray * 255.0)[..., None], 3, axis=-1)
    mask = np.ones((h, w), bool)
    mask[:2] = False
    M, s, g = estimate_shading(jnp.asarray(img), jnp.asarray(nrm),
                               jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(g), gray, atol=1e-5)
    want_M = np.array([_C[1] * x_true[0], _C[1] * x_true[1],
                       _C[1] * x_true[2], _C[3] * x_true[3]])
    np.testing.assert_allclose(np.asarray(M)[:, 0], want_M, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s)[mask], gray[mask], atol=1e-4)


def _albedo_case(h=12, w=10, seed=2):
    rng = np.random.default_rng(seed)
    shading = 0.5 + 0.4 * rng.random((h, w))
    rho_true = np.where(np.arange(w)[None, :] < w // 2, 0.8, 0.4)
    rho_true = np.broadcast_to(rho_true, (h, w)).copy()
    I = rho_true * shading
    depth = 1.0 + 0.1 * rng.random((h, w))
    missing = np.zeros((h, w), bool)
    params = dict(tau_c=0.5, sigma_c=0.2, sigma_d=0.5,
                  lambda_rho=1e-3, lambda_beta1=1e-2, lambda_beta2=10.0)
    return shading, I, depth, missing, rho_true, params


def test_albedo_separation_recovers_piecewise_albedo():
    shading, I, depth, missing, rho_true, params = _albedo_case()
    rho, beta = estimate_albedo_and_specularities(
        shading, I, depth, missing, missing, params)
    # no specular in the input and lambda_beta2 large -> beta ~ 0
    assert np.abs(beta).max() < 0.05
    np.testing.assert_allclose(rho, rho_true, atol=0.05)


def test_albedo_cg_matches_direct_solve():
    shading, I, depth, missing, _, params = _albedo_case(seed=3)
    h, w = I.shape
    rho, beta = estimate_albedo_and_specularities(
        shading, I, depth, missing, missing, params)

    # independent direct solve of the same normal equations
    mat = _neighbor_weight_mat(I, depth, params["tau_c"],
                               params["sigma_c"], params["sigma_d"])
    valid = (~missing).flatten("F") & (~missing).flatten("F")
    mat = mat[:, valid]
    rs = np.asarray(mat.sum(1)).squeeze()
    ra = np.asarray(abs(mat).sum(1)).squeeze()
    mat = mat[(rs <= 1e-6) & (ra != 0)]
    s_v = shading.flatten("F")[valid]
    I_v = I.flatten("F")[valid]
    big = sp.diags(s_v ** 2) + params["lambda_rho"] * (mat.T @ mat)
    rho_direct = spsolve(big.tocsc(), s_v * I_v)
    np.testing.assert_allclose(rho.flatten("F")[valid], rho_direct,
                               atol=1e-4)
    big2 = ((1 + params["lambda_beta2"]) * sp.eye(len(s_v))
            + params["lambda_beta1"] * (mat.T @ mat))
    beta_direct = spsolve(big2.tocsc(), I_v - rho_direct * s_v)
    np.testing.assert_allclose(beta.flatten("F")[valid], beta_direct,
                               atol=1e-4)


def test_refine_surface_fixed_point():
    """If the image is rendered exactly from z0's linearized normals, z0
    minimizes both data and anchor terms, so the refined surface stays
    at z0 (up to the tiny laplacian prior)."""
    rng = np.random.default_rng(4)
    h, w = 12, 10
    z0 = 2.0 + 0.05 * rng.random((h, w))
    M = np.array([0.2, -0.1, 0.6, 0.8])[:, None]
    rho = np.full((h, w), 0.7)
    beta = np.full((h, w), 0.05)

    # linearized shading of z0 on the interior stencil the solver uses:
    # p = z[r,c] - z[r,c+1], q = z[r,c] - z[r+1,c]  (convmtx2 layout)
    p = np.zeros((h, w))
    q = np.zeros((h, w))
    p[:, :-1] = z0[:, :-1] - z0[:, 1:]
    q[:-1, :] = z0[:-1, :] - z0[1:, :]
    eta = 1.0 / np.sqrt(1 + p ** 2 + q ** 2)
    nx, ny, nz = -eta * p, -eta * q, -eta
    I = rho * (M[0, 0] * nx + M[1, 0] * ny + M[2, 0] * nz + M[3, 0]) + beta

    missing = np.zeros((h, w), bool)
    z = refine_surface(z0, rho, beta, M, I, missing,
                       dict(lambda_z1=1e-2, lambda_z2=1e-6))
    assert np.isfinite(z).all()
    np.testing.assert_allclose(z, z0, atol=1e-2)
