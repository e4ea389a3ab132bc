"""Shape-As-Points: trilinear scatter/gather, spectral Poisson solver,
marching-tets extraction, and the custom surface gradient."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fmhr_tpu.recon import (
    DPSR, point_rasterize, grid_interp, psr_to_mesh, sap_generate,
    gen_inputs, marching_tets,
)
from fmhr_tpu.recon.sap import sap_transform


def _sphere_cloud(n=2000, r=0.25, c=0.5, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (c + r * d).astype(np.float32)
    return pts, d.astype(np.float32)


def test_point_rasterize_partition_of_unity():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.random((2, 64, 3)), jnp.float32) * 0.9 + 0.05
    vals = jnp.ones((2, 64, 1), jnp.float32)
    grid = point_rasterize(pts, vals, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(grid).sum((1, 2, 3, 4)),
                               [64.0, 64.0], rtol=1e-5)


def test_rasterize_interp_adjoint():
    # unweighted point_rasterize and grid_interp are exact transposes
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.random((1, 32, 3)), jnp.float32) * 0.9 + 0.05
    v = jnp.asarray(rng.normal(size=(1, 32, 2)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, 6, 6, 6, 2)), jnp.float32)
    lhs = jnp.sum(point_rasterize(pts, v, (6, 6, 6))
                  * jnp.moveaxis(g, -1, 1))
    rhs = jnp.sum(v * grid_interp(g, pts))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_weighted_rasterize_count_normalization():
    # two identical points at one cell: weighted average equals the value
    pts = jnp.asarray([[[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]], jnp.float32)
    vals = jnp.asarray([[[2.0], [2.0]]], jnp.float32)
    g = point_rasterize(pts, vals, (4, 4, 4), weighted=True)
    # every touched corner got two contributions of equal weight -> w*2/2
    gu = point_rasterize(pts, vals, (4, 4, 4), weighted=False)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gu) / 2.0,
                               atol=1e-6)


def test_dpsr_sphere_sign_and_level_set():
    pts, nrm = _sphere_cloud()
    dpsr = DPSR((32, 32, 32), sig=2.0)
    phi = np.asarray(dpsr(jnp.asarray(pts[None]), jnp.asarray(nrm[None])))[0]
    center = phi[16, 16, 16]
    corner = phi[0, 0, 0]
    # the scale step maps the (detached) corner value to +0.5: empty
    # space positive, inside negative, zero crossing at the surface
    assert center < 0 < corner
    np.testing.assert_allclose(corner, 0.5, atol=1e-4)
    # the zero crossing along an axis ray sits at radius ~0.25
    line = phi[16, 16, 16:]
    k = int(np.nonzero(line > 0)[0][0])
    r_est = (k - 0.5) / 32.0
    assert abs(r_est - 0.25) < 0.05


def test_dpsr_gradients_match_fd():
    # float64: the trilinear scatter/gather is piecewise-linear, so f32
    # finite differences are dominated by rounding near cell kinks
    jax.config.update("jax_enable_x64", True)
    try:
        pts, nrm = _sphere_cloud(n=64)
        pts = pts.astype(np.float64)
        # scale=False: the scale step DETACHES the corner value fv0
        # (reference parity), so FD and autodiff legitimately differ
        # through it; the rest must match exactly
        dpsr = DPSR((16, 16, 16), sig=2.0, scale=False)
        probe = jnp.asarray(
            np.random.default_rng(3).normal(size=(1, 16, 16, 16)))

        def loss(p):
            return jnp.sum(dpsr(p, jnp.asarray(nrm[None],
                                               jnp.float64)) * probe)

        p0 = jnp.asarray(pts[None])
        g = np.asarray(jax.grad(loss)(p0))
        rng = np.random.default_rng(4)
        checked = 0
        for _ in range(12):
            i = rng.integers(0, 64)
            d = rng.integers(0, 3)
            eps = 1e-6
            frac = (pts[i, d] * 16.0) % 1.0
            if frac < 0.01 or frac > 0.99:   # trilinear kink: skip
                continue
            pp = np.array(pts[None])
            pp[0, i, d] += eps
            pm = np.array(pts[None])
            pm[0, i, d] -= eps
            fd = (float(loss(jnp.asarray(pp)))
                  - float(loss(jnp.asarray(pm)))) / (2 * eps)
            np.testing.assert_allclose(g[0, i, d], fd, rtol=2e-3,
                                       atol=1e-6)
            checked += 1
        assert checked >= 5
    finally:
        jax.config.update("jax_enable_x64", False)


def test_marching_tets_sphere_watertight():
    r = 24
    x = (np.arange(r) + 0.5) / r
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    grid = 0.3 - np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2)
    verts, faces, normals = marching_tets(grid)
    assert len(verts) > 100
    # radius of extracted verts (grid samples at cell centers shift by
    # half a cell: verts are in node-index/res space)
    rad = np.linalg.norm(verts + 0.5 / r - 0.5, axis=1)
    np.testing.assert_allclose(rad.mean(), 0.3, atol=0.02)
    assert rad.std() < 0.02
    # watertight: every edge is shared by exactly two faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    key = np.sort(e, 1)
    _, counts = np.unique(key[:, 0].astype(np.int64) * len(verts)
                          + key[:, 1], return_counts=True)
    assert (counts == 2).all()
    # normals are gradient ascent: INWARD for this inside-positive field
    # (for the SAP indicator, which is inside-negative, that is outward)
    outward = (verts + 0.5 / r - 0.5)
    outward /= np.maximum(
        np.linalg.norm(outward, axis=1, keepdims=True), 1e-9)
    assert (np.einsum("nd,nd->n", normals, outward) < -0.9).all()
    # winding agrees with normals
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    dots = np.einsum("fd,fd->f", fn, normals[faces].mean(1))
    assert (dots >= 0).all()


def test_psr_to_mesh_shapes_and_counts():
    r = 16
    x = (np.arange(r) + 0.5) / r
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    grid = jnp.asarray(
        (0.3 - np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2))
        [None], jnp.float32)
    verts, faces, normals, nv, nf = psr_to_mesh(grid, 4096, 8192)
    nv, nf = int(nv), int(nf)
    assert verts.shape == (1, 4096, 3) and faces.shape == (8192, 3)
    assert 0 < nv < 4096 and 0 < nf < 8192
    assert (np.asarray(verts)[0, nv:] == 0).all()


def test_sap_end_to_end_fit():
    """Optimize raw SAP inputs so the extracted surface shrinks to a
    target radius — exercises the custom_vjp surface gradient for real."""
    import optax

    pts, nrm = _sphere_cloud(n=512, r=0.3)
    raw = np.log(np.clip(pts, 1e-6, 1 - 1e-6)
                 / (1 - np.clip(pts, 1e-6, 1 - 1e-6)))
    inputs0 = jnp.asarray(np.concatenate([raw, nrm], -1)[None])
    dpsr = DPSR((32, 32, 32), sig=2.0)
    center = jnp.zeros(3)
    scale = jnp.asarray(1.0)
    target = 0.24

    def loss_fn(inputs):
        verts, faces, v, psr, p, nv, nf = sap_generate(
            dpsr, inputs, center, scale, max_verts=16384, max_faces=32768)
        live = (jnp.arange(verts.shape[0]) < nv).astype(jnp.float32)
        # world coords here = unit cube mapped to [-1, 1]; radius of the
        # zero set around the center point (0.0 world = 0.5 cube)
        rad = jnp.linalg.norm(verts - 0.0, axis=-1)
        tgt = (target * 2.0)  # cube radius -> [-1, 1] world radius
        return jnp.sum(live * (rad - tgt) ** 2) / jnp.maximum(
            jnp.sum(live), 1.0)

    opt = optax.adam(0.05)
    params = inputs0
    state = opt.init(params)
    l0 = float(loss_fn(params))
    for _ in range(40):
        l, g = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    l1 = float(loss_fn(params))
    assert np.isfinite(l1)
    assert l1 < 0.25 * l0, (l0, l1)


def test_gen_inputs_roundtrip():
    # cube mesh -> sampled inputs in the unit cube, sigmoid-invertible
    verts = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32) * 0.4
    faces = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
         [0, 1, 5], [0, 5, 4], [1, 2, 6], [1, 6, 5],
         [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]], np.int32)
    inputs, center, scale = gen_inputs(verts, faces, num_sample=256)
    assert inputs.shape == (1, 256, 6)
    p = jax.nn.sigmoid(inputs[0, :, :3])
    assert float(p.min()) >= 0.0 and float(p.max()) <= 1.0
    # mapping the sampled unit-cube points back to world stays inside the
    # original bounding box
    world = np.asarray(sap_transform(p, center, scale, inverse=True))
    assert (np.abs(world) <= 0.4 + 1e-3).all()


def test_marching_tets_native_matches_numpy():
    from fmhr_tpu.utils import native
    from fmhr_tpu.recon.marching import _marching_tets_numpy

    if not native.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(5)
    # smooth random field with both signs
    r = 18
    x = (np.arange(r) + 0.5) / r
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    grid = (0.28 - np.sqrt((X - 0.5) ** 2 + (Y - 0.45) ** 2
                           + (Z - 0.55) ** 2)
            + 0.05 * np.sin(9 * X) * np.cos(7 * Y))
    got = native.marching_tets(np.asarray(grid, np.float64))
    assert got is not None
    v1, f1, n1 = got
    v0, f0, n0 = _marching_tets_numpy(np.asarray(grid, np.float64))
    assert v0.shape == v1.shape and f0.shape == f1.shape
    np.testing.assert_allclose(v0, v1, atol=1e-6)
    np.testing.assert_array_equal(f0, f1)
    np.testing.assert_allclose(n0, n1, atol=1e-5)
