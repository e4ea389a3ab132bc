"""Golden-parity tests: HAND-DERIVED expected values pinned as constants.

Every other oracle in this suite is self-referential (naive vs binned,
fused vs separate, finite differences). These tests instead hard-code
numbers derived on paper from the reference's conventions, so any drift
in convention (corner order, pixel centers, 1-based ids, basis column
order, PSNR formula, LBS transform chain) fails loudly:

- rasterizer output layout: nvdiffrast's rast = (u, v, z/w, id), ids
  1-based, zeros on background; u = perspective-corrected weight of
  corner 0, v of corner 1 (`/root/reference/mesh_sfs_optim.py:142-150`
  consumes this layout from dr.rasterize).
- SH basis: the reference's unnormalized column order
  (`/root/reference/models/utils.py:188-206`).
- LBS: rigid chain transforms on a 2-joint analytic rig
  (`/root/reference/repose.py:43-70`).
- PSNR: the reference's mask-renormalized 28*log10 formula
  (`/root/reference/neural_render.py:32-39`).
"""

import numpy as np
import jax.numpy as jnp

from fmhr_tpu.raster import rasterize, interpolate
from fmhr_tpu.core.sh import sh_basis, sh_radiance
from fmhr_tpu.utils.metrics import psnr_reference


def _tri_clip(two=False):
    """Right triangle with legs 1.6 in NDC, w=1 (affine)."""
    v = np.array([
        [-0.8, -0.8, 0.2, 1.0],
        [0.8, -0.8, 0.4, 1.0],
        [-0.8, 0.8, 0.6, 1.0],
    ], np.float32)
    return jnp.asarray(v[None]), jnp.asarray(np.array([[0, 1, 2]], np.int32))


def test_golden_rasterizer_affine():
    # 8x8: pixel center k has NDC coord -1 + (k + 0.5)/4
    clip, faces = _tri_clip()
    rast = np.asarray(rasterize(clip, faces, (8, 8)))[0]

    # pixel (row 1, col 1): center (-0.625, -0.625), inside.
    # Barycentrics: l1 = (x+0.8)/1.6 = 0.109375, l2 = (y+0.8)/1.6,
    # l0 = 1 - l1 - l2 = 0.78125. z/w = l . (0.2, 0.4, 0.6) = 0.265625.
    np.testing.assert_allclose(
        rast[1, 1], [0.78125, 0.109375, 0.265625, 1.0], atol=1e-6)

    # pixel (3, 3): center (-0.125, -0.125): l1 = l2 = 0.421875
    np.testing.assert_allclose(
        rast[3, 3], [0.15625, 0.421875, 0.453125, 1.0], atol=1e-6)

    # pixel (0, 0): center (-0.875, -0.875) is left of x = -0.8: background
    np.testing.assert_allclose(rast[0, 0], [0, 0, 0, 0], atol=0)
    # pixel (4, 4): center (0.125, 0.125), x + y > 0: outside the
    # hypotenuse
    np.testing.assert_allclose(rast[4, 4], [0, 0, 0, 0], atol=0)


def test_golden_rasterizer_perspective():
    """Same screen triangle but corner 1 at w=2: screen positions are
    unchanged, so coverage and the SCREEN barycentrics l are identical,
    but u/v become perspective-corrected: u_i = (l_i/w_i) / sum(l_j/w_j),
    and rast z stays the screen-linear z/w interpolation."""
    v = np.array([
        [-0.8, -0.8, 0.2, 1.0],
        [1.6, -1.6, 0.8, 2.0],   # sx = 0.8, sy = -0.8, z/w = 0.4
        [-0.8, 0.8, 0.6, 1.0],
    ], np.float32)
    clip = jnp.asarray(v[None])
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    rast = np.asarray(rasterize(clip, faces, (8, 8)))[0]

    l = np.array([0.78125, 0.109375, 0.109375])
    lw = l / np.array([1.0, 2.0, 1.0])
    uvw = lw / lw.sum()
    zw = float(l @ np.array([0.2, 0.4, 0.6]))  # z/w per corner
    np.testing.assert_allclose(
        rast[1, 1], [uvw[0], uvw[1], zw, 1.0], rtol=1e-5)


def test_golden_interpolate_corner_order():
    """One-hot attributes pin the (u, v, 1-u-v) corner assignment."""
    clip, faces = _tri_clip()
    rast = rasterize(clip, faces, (8, 8))
    attr = jnp.asarray(np.eye(3, dtype=np.float32)[None])  # corner k -> e_k
    feat = np.asarray(interpolate(attr, rast, faces))[0]
    np.testing.assert_allclose(
        feat[1, 1], [0.78125, 0.109375, 0.109375], atol=1e-6)
    np.testing.assert_allclose(feat[0, 0], [0, 0, 0], atol=0)


def test_golden_rasterizer_gradient():
    """Analytic du/dx0 at a covered pixel (affine triangle).

    u = l0 = A0(p)/d with A0 independent of v0 and
    d = (x1-x0)(y2-y0) - (x2-x0)(y1-y0), so
    du/dx0 = -l0 (y1-y2)/d, du/dy0 = -l0 (x2-x1)/d.
    Here d = 1.6*1.6 = 2.56, y1-y2 = -1.6, x2-x1 = -1.6:
    du/dx0 = du/dy0 = l0 * 1.6/2.56 = 0.625 l0.
    """
    import jax

    clip, faces = _tri_clip()

    def u_at(c):
        rast = rasterize(c, faces, (8, 8))
        return rast[0, 1, 1, 0]

    g = np.asarray(jax.grad(u_at)(clip))[0]
    l0 = 0.78125
    np.testing.assert_allclose(
        g[0, :2], [0.625 * l0, 0.625 * l0], rtol=1e-5)


def test_golden_sh_basis():
    n = jnp.asarray(np.array([[0.6, 0.8, 0.0]], np.float32))
    b = np.asarray(sh_basis(n, 3))[0]
    # columns: 1, ny, nz, nx, nx*ny, ny*nz, 2nz^2-nx^2-ny^2, nz*nx,
    # nx^2-ny^2
    np.testing.assert_allclose(
        b, [1.0, 0.8, 0.0, 0.6, 0.48, 0.0, -1.0, 0.0, -0.28], atol=1e-6)

    coeff = jnp.asarray(
        np.array([0.5, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], np.float32))
    # 0.5 + 0.8 + 0 + 1.8 + 1.92 + 0 - 6.0 + 0 - 2.24 = -3.22
    np.testing.assert_allclose(
        float(sh_radiance(coeff, n, 3)[0]), -3.22, atol=1e-5)


def test_golden_lbs_two_joint_chain():
    """2-joint rig: joint0 at origin, joint1 at (1,0,0); a vertex at
    (2,0,0) skinned rigidly to joint1. Rotating joint1 by +90 deg about z
    maps it to joint1 + Rz(90)(v - joint1) = (1, 1, 0). Rotating the ROOT
    instead spins the whole chain about the origin."""
    import dataclasses
    from fmhr_tpu.body.mano import ManoModel, lbs, lbs_tpose

    V, J = 3, 2
    v_template = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    model = ManoModel(
        v_template=v_template,
        shapedirs=np.zeros((V, 3, 1), np.float32),
        posedirs=np.zeros(((J - 1) * 9, V * 3), np.float32),
        J_regressor=np.array([[1, 0, 0], [0, 1, 0]], np.float32),
        lbs_weights=np.array([[1, 0], [1, 0], [0, 1]], np.float32),
        parents=(-1, 0),
        faces=np.zeros((0, 3), np.int32),
        hand_mean=np.zeros((J - 1) * 3, np.float32),
        hand_components=np.zeros((1, (J - 1) * 3), np.float32),
        is_rhand=True,
    )
    betas = jnp.zeros((1, 1))
    w = jnp.asarray(model.lbs_weights)
    vt = jnp.asarray(v_template[None])

    half_pi = float(np.pi / 2)
    # child joint +90 deg about z
    pose = jnp.asarray(np.array([[0, 0, 0, 0, 0, half_pi]], np.float32))
    out = np.asarray(lbs(model, pose, betas, w, vt, add_pose_mean=False))[0]
    np.testing.assert_allclose(
        out, [[0, 0, 0], [1, 0, 0], [1, 1, 0]], atol=1e-6)

    # root +90 deg about z: v1 -> (0,1,0), v2 -> (0,2,0)
    pose = jnp.asarray(np.array([[0, 0, half_pi, 0, 0, 0]], np.float32))
    out = np.asarray(lbs(model, pose, betas, w, vt, add_pose_mean=False))[0]
    np.testing.assert_allclose(
        out, [[0, 0, 0], [0, 1, 0], [0, 2, 0]], atol=1e-6)

    # inverse LBS returns the posed verts to the T-pose exactly
    posed = jnp.asarray(out[None])
    back = np.asarray(lbs_tpose(model, pose, betas, w, posed,
                                add_pose_mean=False))[0]
    np.testing.assert_allclose(back, v_template, atol=1e-5)


def test_golden_psnr_reference():
    """mask-renormalized MSE + 28 (not 20) multiplier, bug-for-bug."""
    img1 = np.full((2, 2, 3), 1.0)
    img2 = np.full((2, 2, 3), 0.5)
    mask = np.array([[1.0, 1.0], [0.0, 0.0]])
    # mse = 0.25 * (4 / 2) = 0.5; psnr = 28 log10(1/sqrt(0.5)) = 14 log10 2
    np.testing.assert_allclose(
        psnr_reference(img1, img2, mask), 14 * np.log10(2.0), rtol=1e-12)
