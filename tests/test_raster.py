"""Rasterizer tests: coverage, equivalence, gradients, silhouette fit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from fmhr_tpu.raster import rasterize, interpolate, rasterize_ids, antialias, AATopology
from fmhr_tpu.raster.visibility import rasterize_ids_naive, rasterize_ids_binned


def make_clip(verts2d, z_view):
    """[N,2] NDC xy + scalar/array view depth -> clip [1,N,4] with the
    reference convention (w = depth, z = -0.1)."""
    n = verts2d.shape[0]
    z_view = np.broadcast_to(np.asarray(z_view, np.float32), (n,))
    clip = np.stack(
        [verts2d[:, 0] * z_view, verts2d[:, 1] * z_view,
         np.full(n, -0.1, np.float32), z_view], 1
    )
    return jnp.asarray(clip[None], jnp.float32)


def big_triangle(z=1.0):
    v = np.array([[-0.8, -0.8], [0.8, -0.8], [0.0, 0.8]], np.float32)
    return make_clip(v, z), jnp.asarray([[0, 1, 2]], jnp.int32)


def test_single_triangle_coverage():
    clip, faces = big_triangle()
    ids = rasterize_ids(clip, faces, (64, 64), impl="naive")
    ids = np.asarray(ids[0])
    assert ids[32, 32] == 1          # center covered
    assert ids[2, 2] == 0            # corner background
    frac = (ids > 0).mean()
    assert 0.2 < frac < 0.5          # triangle area ~0.32 of the square


def test_winding_invariance():
    clip, _ = big_triangle()
    f1 = jnp.asarray([[0, 1, 2]], jnp.int32)
    f2 = jnp.asarray([[0, 2, 1]], jnp.int32)
    a = rasterize_ids(clip, f1, (32, 32), impl="naive")
    b = rasterize_ids(clip, f2, (32, 32), impl="naive")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depth_ordering():
    # near triangle occludes far triangle
    v = np.array(
        [[-0.8, -0.8], [0.8, -0.8], [0.0, 0.8],
         [-0.8, -0.8], [0.8, -0.8], [0.0, 0.8]], np.float32
    )
    z = np.array([2.0, 2.0, 2.0, 1.0, 1.0, 1.0], np.float32)
    clip = make_clip(v, z)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    ids = np.asarray(rasterize_ids(clip, faces, (32, 32), impl="naive")[0])
    assert ids[16, 16] == 2  # nearer triangle (id 2) wins


def test_rast_uv_and_interpolate():
    clip, faces = big_triangle()
    rast = rasterize(clip, faces, (64, 64), impl="naive")
    ids = rast[..., 3]
    # u+v+(1-u-v)=1 by construction; check uv in [0,1] where covered
    cov = np.asarray(ids[0]) > 0
    u = np.asarray(rast[0, ..., 0])[cov]
    v = np.asarray(rast[0, ..., 1])[cov]
    assert (u >= -1e-4).all() and (v >= -1e-4).all() and (u + v <= 1 + 1e-4).all()

    # interpolating vertex xy must reproduce pixel NDC positions
    verts_attr = clip[:, :, :2] / clip[:, :, 3:4]
    out = interpolate(verts_attr, rast, faces)
    px = (np.arange(64) + 0.5) / 32 - 1
    exp_x = np.broadcast_to(px[None, :], (64, 64))
    got_x = np.asarray(out[0, ..., 0])
    err = np.abs(got_x - exp_x)[cov]
    assert err.max() < 1e-4


def test_perspective_correct_barycentrics():
    # Skewed-depth triangle: perspective-correct interpolation of an
    # attribute equals analytic projective interpolation.
    v = np.array([[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]], np.float32)
    z = np.array([1.0, 3.0, 2.0], np.float32)
    clip = make_clip(v, z)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    rast = rasterize(clip, faces, (128, 128), impl="naive")
    # attribute = view depth w; perspective-correct interp of w satisfies
    # 1/w_interp = screen-linear interp of 1/w. Check at covered pixels.
    attr = clip[:, :, 3:4]
    out = np.asarray(interpolate(attr, rast, faces)[0, ..., 0])
    cov = np.asarray(rast[0, ..., 3]) > 0
    zw = np.asarray(rast[0, ..., 2])  # = -0.1 * (screen-linear 1/w)
    inv_w_lin = zw / -0.1
    np.testing.assert_allclose(1.0 / out[cov], inv_w_lin[cov], rtol=1e-3)


def test_binned_matches_naive_random_mesh(rng):
    # random triangle soup
    V, F = 60, 40
    verts = rng.uniform(-0.9, 0.9, size=(V, 2)).astype(np.float32)
    z = rng.uniform(1.0, 3.0, size=V).astype(np.float32)
    clip = make_clip(verts, z)
    faces = jnp.asarray(rng.integers(0, V, size=(F, 3)), jnp.int32)
    a = np.asarray(rasterize_ids_naive(clip, faces, 96, 160))
    b = np.asarray(
        rasterize_ids_binned(
            clip, faces, 96, 160, tile_h=8, tile_w=32, capacity=64,
            chunk=8, max_span=16, global_capacity=48,
        )
    )
    mismatch = (a != b).mean()
    assert mismatch < 1e-3, f"binned vs naive mismatch {mismatch}"


def test_binned_matches_naive_with_tile_padding():
    # Regression: when W is not a multiple of tile_w the padded grid must
    # not change the pixel->NDC scale (bug caught by the render drive).
    clip, faces = big_triangle()
    a = np.asarray(rasterize_ids_naive(clip, faces, 64, 64))
    b = np.asarray(rasterize_ids_binned(clip, faces, 64, 64))  # tile_w=128>64
    np.testing.assert_array_equal(a, b)


def test_binned_global_list_oversized_faces(rng):
    # One huge triangle spanning every tile + small ones.
    verts = np.array(
        [[-3, -3], [3, -3], [0, 3],
         [-0.2, -0.2], [0.2, -0.2], [0.0, 0.2]], np.float32
    )
    z = np.array([2, 2, 2, 1, 1, 1], np.float32)
    clip = make_clip(verts, z)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    a = np.asarray(rasterize_ids_naive(clip, faces, 64, 64))
    b = np.asarray(
        rasterize_ids_binned(clip, faces, 64, 64, tile_h=8, tile_w=16,
                             capacity=8, max_span=2, global_capacity=4)
    )
    np.testing.assert_array_equal(a, b)


def test_interpolate_gradient_matches_fd():
    # d(interpolated attr at pixel)/d(vertex x) via autodiff == finite diff.
    clip_np = np.asarray(big_triangle()[0])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    attr = jnp.asarray(np.array([[[1.0], [2.0], [3.0]]], np.float32))
    res = (32, 32)
    ids = rasterize_ids(jnp.asarray(clip_np), faces, res, impl="naive")

    from fmhr_tpu.raster.api import barycentrics_from_ids

    def render_sum(clip):
        rast = barycentrics_from_ids(ids, clip, faces, res)
        out = interpolate(attr, rast, faces)
        return jnp.sum(out * out)  # smooth functional

    g = jax.grad(render_sum)(jnp.asarray(clip_np))
    eps = 1e-3
    for (vi, ci) in [(0, 0), (1, 1), (2, 0), (0, 3)]:
        d = np.zeros_like(clip_np)
        d[0, vi, ci] = eps
        fd = (render_sum(jnp.asarray(clip_np + d)) -
              render_sum(jnp.asarray(clip_np - d))) / (2 * eps)
        ad = float(g[0, vi, ci])
        assert abs(fd - ad) < 2e-2 * max(1.0, abs(fd)), (vi, ci, fd, ad)


def test_antialias_moves_mask_gradient():
    # Without AA, sum of mask has ~zero gradient w.r.t. vertex positions;
    # with AA the gradient must match the finite difference of the
    # antialiased mask sum.
    clip0, faces = big_triangle()
    clip0 = np.asarray(clip0)
    res = (64, 64)
    topo = AATopology.build(np.asarray(faces), 3)
    ones = jnp.ones((1, 3, 1))

    def aa_mask_sum(clip):
        rast = rasterize(clip, faces, res, impl="naive")
        m = interpolate(ones, rast, faces)
        return jnp.sum(antialias(m, rast, clip, faces, topo))

    g = jax.grad(aa_mask_sum)(jnp.asarray(clip0))
    # gradient should be substantially nonzero (silhouette term)
    assert float(jnp.abs(g).sum()) > 1e-3

    # finite-difference check on vertex 2 (apex) moving up in y
    eps = 1e-3
    d = np.zeros_like(clip0)
    d[0, 2, 1] = eps
    fd = (aa_mask_sum(jnp.asarray(clip0 + d))
          - aa_mask_sum(jnp.asarray(clip0 - d))) / (2 * eps)
    ad = float(g[0, 2, 1])
    assert abs(fd - ad) < 0.25 * max(1.0, abs(fd)), (fd, ad)
    # Moving apex +y grows the triangle -> mask sum increases
    assert ad > 0


def test_silhouette_fit_converges():
    # The MVP end-to-end slice: optimize 2D vertex positions of a triangle
    # to match a target mask, driven ONLY by antialias gradients.
    res = (48, 48)
    target_v = np.array([[-0.6, -0.5], [0.7, -0.4], [0.0, 0.65]], np.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    topo = AATopology.build(np.asarray(faces), 3)
    ones = jnp.ones((1, 3, 1))

    def render_mask(v2d):
        z = jnp.ones(3)
        clip = jnp.stack(
            [v2d[:, 0] * z, v2d[:, 1] * z, jnp.full((3,), -0.1), z], 1
        )[None]
        rast = rasterize(clip, faces, res, impl="naive")
        m = interpolate(ones, rast, faces)
        return antialias(m, rast, clip, faces, topo)[..., 0]

    target = jax.lax.stop_gradient(render_mask(jnp.asarray(target_v)))

    v = jnp.asarray(target_v + np.array([[0.15, 0.1], [-0.1, 0.12], [0.08, -0.15]], np.float32))
    opt = optax.adam(3e-2)
    state = opt.init(v)

    @jax.jit
    def step(v, state):
        loss, g = jax.value_and_grad(
            lambda vv: jnp.mean((render_mask(vv) - target) ** 2)
        )(v)
        upd, state = opt.update(g, state)
        return optax.apply_updates(v, upd), state, loss

    loss0 = None
    for i in range(120):
        v, state, loss = step(v, state)
        if loss0 is None:
            loss0 = float(loss)
    final = float(loss)
    assert final < 0.2 * loss0, (loss0, final)
    assert np.abs(np.asarray(v) - target_v).max() < 0.08


@pytest.mark.slow
def test_default_capacity_covers_bench_scene():
    # densest tiles of the benchmark scene must fit the default capacity
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.optim.ham import project_verts
    from fmhr_tpu.raster.visibility import _bin_one_view
    from fmhr_tpu.raster.api import default_capacity

    verts, faces, w2cs, projs = hand_scene(res=512, n_views=4, subdiv=2)
    clip = jnp.asarray(project_verts(
        jnp.asarray(verts), jnp.asarray(w2cs), jnp.asarray(projs)))
    tri = clip[:, jnp.asarray(faces)]
    cap = default_capacity(faces.shape[0])
    for b in range(4):
        _, counts, _ = _bin_one_view(
            tri[b], tile_h=8, tile_w=128, tiles_y=64, tiles_x=4,
            height=512, width=512, max_span=16, capacity=8192,
            global_capacity=64,
        )
        assert int(np.asarray(counts).max()) <= cap


def test_render_pixels_matches_separate_path():
    # the fused single-gather path must equal rasterize+interpolate+AA
    from fmhr_tpu.raster import render_pixels, antialias_weights
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.optim.ham import project_verts

    verts, faces, w2cs, projs = hand_scene(res=64, n_views=2)
    clip = project_verts(jnp.asarray(verts), jnp.asarray(w2cs), jnp.asarray(projs))
    attr = jnp.concatenate(
        [jnp.asarray(verts), jnp.ones((verts.shape[0], 1))], -1
    )
    topo = AATopology.build(faces, verts.shape[0])

    rast_f, feat_f, aa_f = render_pixels(clip, attr, faces, (64, 64),
                                         aa_topology=topo)
    rast_s = rasterize(clip, faces, (64, 64))
    feat_s = interpolate(attr, rast_s, faces)
    aa_s = antialias_weights(rast_s, clip, faces, topo)

    np.testing.assert_allclose(np.asarray(rast_f), np.asarray(rast_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat_f), np.asarray(feat_s),
                               rtol=1e-5, atol=1e-6)
    for k in ("h", "v"):
        for a, b in zip(aa_f[k], aa_s[k]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
