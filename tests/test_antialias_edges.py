"""Antialias edge cases (VERDICT r1 item 10): interior shared-edge
skipping on a two-triangle quad, the occlusion-boundary depth-tie
`use_p` selection branch with analytically-known crossing positions, and
horizontal/vertical pair symmetry.

Role parity: `/root/reference/mesh_sfs_optim.py:146-147` — dr.antialias
is the only source of silhouette gradients in HAM, so these boundary
rules are load-bearing for geometry optimization.
"""

import numpy as np
import jax.numpy as jnp

from fmhr_tpu.raster import rasterize, AATopology
from fmhr_tpu.raster.antialias import antialias_weights, apply_antialias


def _clip(xy_z):
    """[(x, y, z), ...] -> clip [1, N, 4] with w=1."""
    v = np.array([[x, y, z, 1.0] for x, y, z in xy_z], np.float32)
    return jnp.asarray(v[None])


def test_shared_edge_skipped_on_quad():
    """Two triangles sharing the quad diagonal: id changes across the
    diagonal must produce NO aa weight (it is not a silhouette), while
    the quad's outer boundary must produce some."""
    # 0.45 (not 0.5) so the outer boundary does NOT land exactly on a
    # pixel-pair midpoint (s=0.5 would give zero weight by definition)
    clip = _clip([(-0.45, -0.45, 0.5), (0.45, -0.45, 0.5),
                  (0.45, 0.45, 0.5), (-0.45, 0.45, 0.5)])
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    topo = AATopology.build(np.asarray(faces), 4)
    res = (16, 16)
    rast = rasterize(clip, faces, res)
    ids = np.asarray(rast[..., 3]).astype(np.int32)
    assert set(np.unique(ids)) == {0, 1, 2}

    w = antialias_weights(rast, clip, faces, topology=topo)

    # pairs straddling the diagonal: both covered, different ids
    for key, axis in (("h", 2), ("v", 1)):
        a_p, a_q = (np.asarray(x) for x in w[key])
        sl_p = [slice(None)] * 3
        sl_q = [slice(None)] * 3
        sl_p[axis] = slice(0, -1)
        sl_q[axis] = slice(1, None)
        ip, iq = ids[tuple(sl_p)], ids[tuple(sl_q)]
        interior = (ip > 0) & (iq > 0) & (ip != iq)
        assert interior.any(), "quad diagonal must produce interior pairs"
        np.testing.assert_array_equal(a_p[interior], 0.0)
        np.testing.assert_array_equal(a_q[interior], 0.0)
        # outer silhouette (covered vs background) must yield weight
        boundary = ((ip > 0) != (iq > 0))
        assert (a_p[boundary] > 0).any() or (a_q[boundary] > 0).any()

    # without topology the weights may be nonzero on the diagonal, but
    # blending a continuous color buffer must stay ~unchanged there
    w_nt = antialias_weights(rast, clip, faces, topology=None)
    color = jnp.ones((1, *res, 3)) * jnp.asarray([0.3, 0.6, 0.9])
    out = np.asarray(apply_antialias(color, w_nt))
    np.testing.assert_allclose(out, np.asarray(color), atol=1e-6)


def _occlusion_scene(z_front, z_back):
    """Front tri with a vertical RIGHT edge at x=0.2, back tri with a
    vertical LEFT edge at x=0.15. At 8x8, pixel centers 0.125 and 0.375
    straddle both edges: p=(col 4) is covered only by the front surface,
    q=(col 5) only by the back one, and BOTH sides find a crossing, so
    the depth comparison (antialias rule: nearer surface's edge wins)
    decides the blend: s=0.3 for the front edge, s=0.1 for the back."""
    clip = _clip([
        (0.2, -2.0, z_front), (0.2, 2.0, z_front), (-3.0, 0.0, z_front),
        (0.15, -2.0, z_back), (0.15, 2.0, z_back), (3.0, 0.0, z_back),
    ])
    faces = jnp.asarray(np.array([[0, 2, 1], [3, 4, 5]], np.int32))
    topo = AATopology.build(np.asarray(faces), 6)
    rast = rasterize(clip, faces, (8, 8))
    return clip, faces, topo, rast


def test_occlusion_boundary_prefers_near_surface():
    clip, faces, topo, rast = _occlusion_scene(0.2, 0.7)
    ids = np.asarray(rast[..., 3]).astype(np.int32)
    row = 3  # y = -0.125: inside both triangles
    assert ids[0, row, 4] == 1 and ids[0, row, 5] == 2

    a_p, a_q = (np.asarray(x) for x in
                antialias_weights(rast, clip, faces, topology=topo)["h"])
    # near (front) edge at x=0.2 -> s = (0.2-0.125)/0.25 = 0.3
    np.testing.assert_allclose(a_p[0, row, 4], 0.2, atol=1e-6)
    np.testing.assert_allclose(a_q[0, row, 4], 0.0, atol=1e-6)


def test_occlusion_boundary_far_surface_when_depths_swap():
    """Same geometry but the left surface is FAR: the q-side (near)
    edge at x=0.15 must be chosen instead -> s = 0.1."""
    clip, faces, topo, rast = _occlusion_scene(0.7, 0.2)
    ids = np.asarray(rast[..., 3]).astype(np.int32)
    row = 3
    # overlap strip (0.15 < x < 0.2) now belongs to the near BACK tri,
    # but columns are unchanged at the pair of interest
    assert ids[0, row, 4] == 1 and ids[0, row, 5] == 2

    a_p, a_q = (np.asarray(x) for x in
                antialias_weights(rast, clip, faces, topology=topo)["h"])
    np.testing.assert_allclose(a_p[0, row, 4], 0.4, atol=1e-6)
    np.testing.assert_allclose(a_q[0, row, 4], 0.0, atol=1e-6)


def test_horizontal_vertical_symmetry():
    """Swapping x<->y transposes the image and swaps the h/v weight
    maps exactly."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.9, 0.9, (3, 2)).astype(np.float32)
    z = np.float32(0.5)
    clip_a = _clip([(x, y, z) for x, y in pts])
    clip_b = _clip([(y, x, z) for x, y in pts])
    # swap flips orientation; reverse winding so both are front-facing
    faces_a = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    faces_b = jnp.asarray(np.array([[0, 2, 1]], np.int32))
    res = (16, 16)
    rast_a = rasterize(clip_a, faces_a, res)
    rast_b = rasterize(clip_b, faces_b, res)
    np.testing.assert_array_equal(
        np.asarray(rast_a[..., 3]),
        np.asarray(rast_b[..., 3]).transpose(0, 2, 1))

    wa = antialias_weights(rast_a, clip_a, faces_a)
    wb = antialias_weights(rast_b, clip_b, faces_b)
    for (ap, aq), (bp, bq) in (
        (wa["h"], wb["v"]), (wa["v"], wb["h"]),
    ):
        np.testing.assert_allclose(
            np.asarray(ap), np.asarray(bp).transpose(0, 2, 1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(aq), np.asarray(bq).transpose(0, 2, 1), atol=1e-6)


def test_compact_aa_matches_dense():
    """The compact silhouette-pair AA path is bit-identical to the dense
    path (fwd weights and clip gradients) when the budget fits."""
    import jax
    import jax.numpy as jnp
    from fmhr_tpu.raster.deferred import (
        DeferredTopology, render_pixels_deferred)
    from fmhr_tpu.raster import apply_antialias
    from fmhr_tpu.raster.antialias import audit_aa_pairs
    from tests.test_deferred import sphere_scene

    clip, faces, attr = sphere_scene(n_views=2, res=(32, 256))
    res = (32, 256)
    topo = DeferredTopology.build(faces, clip.shape[1])

    def run(budget, c):
        rast, feat, aa_w = render_pixels_deferred(
            c, attr, topo, res, max_span=8, interpret=True,
            aa_budget=budget)
        return rast, feat, aa_w

    r0, f0, a0 = run(None, clip)
    ids = np.asarray(r0[..., 3]).astype(np.int64)
    bh, bv = audit_aa_pairs(ids)
    r1, f1, a1 = run((2 * bh, 2 * bv), clip)
    for k in ("h", "v"):
        for x, y in zip(a0[k], a1[k]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def loss(budget):
        def fn(c):
            rast, feat, aa_w = run(budget, c)
            img = apply_antialias(feat[..., :3], aa_w)
            return jnp.sum(img ** 2)
        return fn

    g0 = jax.grad(loss(None))(clip)
    g1 = jax.grad(loss((2 * bh, 2 * bv)))(clip)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-6, atol=1e-7)

    # tiny budget: overflow pairs gracefully lose AA, nothing crashes
    r2, f2, a2 = run((8, 8), clip)
    assert np.isfinite(np.asarray(a2["h"][0])).all()


def test_compact_aa_on_xla_path():
    """aa_budget plumbs through render_pixels' XLA fallback too (the
    bench fallback combination FMHR_AA_BUDGET=audit + --impl binned):
    compact weights match the dense naive-path weights bit-for-bit, and
    'auto' / junk strings are handled."""
    import pytest
    from fmhr_tpu.raster import render_pixels, AATopology
    from fmhr_tpu.raster.antialias import audit_aa_pairs
    from tests.test_deferred import sphere_scene

    clip, faces, attr = sphere_scene(n_views=2, res=(32, 256))
    res = (32, 256)
    topo_aa = AATopology.build(np.asarray(faces), clip.shape[1])

    r0, f0, a0 = render_pixels(clip, attr, faces, res, impl="naive",
                               aa_topology=topo_aa)
    bh, bv = audit_aa_pairs(np.asarray(r0[..., 3]).astype(np.int64))
    r1, f1, a1 = render_pixels(clip, attr, faces, res, impl="naive",
                               aa_topology=topo_aa,
                               aa_budget=(2 * bh, 2 * bv))
    for k in ("h", "v"):
        for x, y in zip(a0[k], a1[k]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # "auto" degrades to dense on the XLA path; junk strings raise
    render_pixels(clip, attr, faces, res, impl="naive",
                  aa_topology=topo_aa, aa_budget="auto")
    with pytest.raises(ValueError):
        render_pixels(clip, attr, faces, res, impl="naive",
                      aa_topology=topo_aa, aa_budget="audit")
