"""Deferred-shading Pallas path vs the XLA render path (interpret mode).

Oracle: raster.api.render_pixels (itself validated against the naive
rasterizer and finite differences in test_raster.py). The deferred op
must match its outputs AND its gradients — the custom_vjp backward is a
completely different computation (one-hot matmuls + segment sums vs XLA
autodiff scatter-adds), so allclose here certifies the whole machinery.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fmhr_tpu.raster import render_pixels, apply_antialias, AATopology
from fmhr_tpu.raster.deferred import (
    DeferredTopology, render_pixels_deferred,
)


def sphere_scene(n_views=2, res=(32, 256), n_sub=1, seed=0):
    """A faceted sphere viewed from n_views angles; returns clip, faces,
    attrs. Spans multiple 8x128 tiles; some faces cross tile borders."""
    import math

    # icosphere-ish: latitude-longitude sphere (static topology)
    n_lat, n_lon = 6 * (n_sub + 1), 8 * (n_sub + 1)
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = math.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * math.pi * j / n_lon
            verts.append([
                math.sin(th) * math.cos(ph),
                math.sin(th) * math.sin(ph),
                math.cos(th),
            ])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    verts = np.asarray(verts, np.float32) * 0.6
    faces = np.asarray(faces, np.int32)

    rng = np.random.default_rng(seed)
    clips = []
    for v in range(n_views):
        ang = 2 * math.pi * v / max(n_views, 1) + 0.3
        R = np.asarray(
            [[math.cos(ang), 0, math.sin(ang)],
             [0, 1, 0],
             [-math.sin(ang), 0, math.cos(ang)]], np.float32)
        vv = verts @ R.T
        depth = vv[:, 2] + 2.5  # in front of camera
        clip = np.stack(
            [vv[:, 0] * depth * 0.9, vv[:, 1] * depth * 0.9,
             np.full(len(verts), -0.1, np.float32), depth], 1)
        clips.append(clip)
    clip = jnp.asarray(np.stack(clips), jnp.float32)
    attr = jnp.asarray(rng.standard_normal((len(verts), 5)), jnp.float32)
    return clip, faces, attr


@pytest.fixture(scope="module")
def scene():
    return sphere_scene()


def _xla_path(clip, attr, faces, res, topo_aa):
    rast, feat, aa_w = render_pixels(
        clip, attr, jnp.asarray(faces), res,
        impl="naive", aa_topology=topo_aa)
    return rast, feat, aa_w


def _deferred_path(clip, attr, faces, res, topo):
    return render_pixels_deferred(
        clip, attr, topo, res, max_span=8, interpret=True)


def test_deferred_forward_matches_xla(scene):
    clip, faces, attr = scene
    res = (32, 256)
    topo = DeferredTopology.build(faces, attr.shape[0])
    topo_aa = AATopology.build(faces, attr.shape[0])

    rast_x, feat_x, aa_x = _xla_path(clip, attr, faces, res, topo_aa)
    rast_d, feat_d, aa_d = _deferred_path(clip, attr, faces, res, topo)

    np.testing.assert_array_equal(
        np.asarray(rast_x[..., 3]), np.asarray(rast_d[..., 3]))
    np.testing.assert_allclose(
        np.asarray(rast_x), np.asarray(rast_d), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(feat_x), np.asarray(feat_d), atol=1e-5, rtol=1e-5)
    out_x = apply_antialias(feat_x, aa_x)
    out_d = apply_antialias(feat_d, aa_d)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_d), atol=1e-5, rtol=1e-5)


def test_deferred_gradients_match_xla(scene):
    clip, faces, attr = scene
    res = (32, 256)
    topo = DeferredTopology.build(faces, attr.shape[0])
    topo_aa = AATopology.build(faces, attr.shape[0])
    rng = np.random.default_rng(1)
    gimg = jnp.asarray(
        rng.standard_normal((clip.shape[0],) + res + (attr.shape[-1],)),
        jnp.float32)

    def loss_x(clip, attr):
        rast, feat, aa_w = _xla_path(clip, attr, faces, res, topo_aa)
        out = apply_antialias(feat, aa_w)
        return jnp.sum(out * gimg) + jnp.sum(rast[..., :3] ** 2) * 0.1

    def loss_d(clip, attr):
        rast, feat, aa_w = _deferred_path(clip, attr, faces, res, topo)
        out = apply_antialias(feat, aa_w)
        return jnp.sum(out * gimg) + jnp.sum(rast[..., :3] ** 2) * 0.1

    lx, (gx_clip, gx_attr) = jax.value_and_grad(loss_x, argnums=(0, 1))(
        clip, attr)
    ld, (gd_clip, gd_attr) = jax.value_and_grad(loss_d, argnums=(0, 1))(
        clip, attr)

    np.testing.assert_allclose(float(lx), float(ld), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gx_clip), np.asarray(gd_clip), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gx_attr), np.asarray(gd_attr), atol=2e-4, rtol=1e-3)


def test_deferred_batched_attr(scene):
    clip, faces, attr = scene
    res = (32, 256)
    topo = DeferredTopology.build(faces, attr.shape[0])
    B = clip.shape[0]
    rng = np.random.default_rng(2)
    attr_b = jnp.asarray(
        rng.standard_normal((B, attr.shape[0], 3)), jnp.float32)
    topo_aa = AATopology.build(faces, attr.shape[0])
    _, feat_x, _ = _xla_path(clip, attr_b, faces, res, topo_aa)
    _, feat_d, _ = _deferred_path(clip, attr_b, faces, res, topo)
    np.testing.assert_allclose(
        np.asarray(feat_x), np.asarray(feat_d), atol=1e-5, rtol=1e-5)


def test_deferred_globals_path():
    # big triangles exceed max_span -> global list path
    clip, faces, attr = sphere_scene(n_views=1, res=(32, 256))
    big = np.asarray(
        [[-2.0, -2.0], [2.0, -2.0], [0.0, 2.0]], np.float32)
    depth = 4.0
    big_clip = np.stack(
        [big[:, 0] * depth, big[:, 1] * depth,
         np.full(3, -0.1, np.float32), np.full(3, depth, np.float32)], 1)
    nv = attr.shape[0]
    clip = jnp.concatenate(
        [clip, jnp.asarray(big_clip[None])], axis=1)
    faces2 = np.concatenate(
        [np.asarray(faces), np.asarray([[nv, nv + 1, nv + 2]], np.int32)])
    attr2 = jnp.concatenate(
        [attr, jnp.ones((3, attr.shape[1]), jnp.float32)], axis=0)
    res = (32, 256)
    topo = DeferredTopology.build(faces2, nv + 3)
    topo_aa = AATopology.build(faces2, nv + 3)
    rast_x, feat_x, _ = _xla_path(clip, attr2, faces2, res, topo_aa)
    rast_d, feat_d, _ = render_pixels_deferred(
        clip, attr2, topo, res, max_span=2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(rast_x[..., 3]), np.asarray(rast_d[..., 3]))
    np.testing.assert_allclose(
        np.asarray(feat_x), np.asarray(feat_d), atol=1e-5, rtol=1e-5)


def test_deferred_face_order(scene):
    """A static face permutation (DeferredTopology order=...) must be
    externally invisible: identical rast (incl. ORIGINAL face ids),
    features, and AA output vs the unpermuted topology."""
    clip, faces, attr = scene
    res = (32, 256)
    rng = np.random.default_rng(7)
    perm = rng.permutation(faces.shape[0]).astype(np.int32)
    topo = DeferredTopology.build(faces, attr.shape[0])
    topo_p = DeferredTopology.build(faces, attr.shape[0], order=perm)

    rast_a, feat_a, aa_a = render_pixels_deferred(
        clip, attr, topo, res, max_span=8, interpret=True)
    rast_b, feat_b, aa_b = render_pixels_deferred(
        clip, attr, topo_p, res, max_span=8, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(rast_a[..., 3]), np.asarray(rast_b[..., 3]))
    np.testing.assert_allclose(
        np.asarray(rast_a), np.asarray(rast_b), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(feat_a), np.asarray(feat_b), atol=1e-5, rtol=1e-5)
    out_a = apply_antialias(feat_a, aa_a)
    out_b = apply_antialias(feat_b, aa_b)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), atol=1e-5, rtol=1e-5)


def test_winner_lists_overflow_clamps():
    """_winner_lists keeps the lowest-numbered wcap chunks and clamps
    wcnt; overflow pixels degrade to background in pass B (documented)."""
    from fmhr_tpu.raster.deferred import _winner_lists, _plan, _CHUNK

    F = 40 * _CHUNK
    p = _plan(F, 0, 0, 32, 256, 8, 64, winner_cap=8)
    assert p["wcap"] == 8
    rng = np.random.default_rng(3)
    # one tile whose pixels win from 40 distinct chunks
    slot = (rng.integers(0, 40, (1, 1, 1024)) * _CHUNK + 3).astype(np.int32)
    slot[0, 0, 0] = -1
    wlist, wcnt = _winner_lists(jnp.asarray(slot), p)
    assert int(wcnt[0, 0]) == 8
    np.testing.assert_array_equal(np.asarray(wlist[0, 0]), np.arange(8))


def test_deferred_gradients_degenerate_faces():
    """The hand-written VJP must reproduce XLA autodiff's eps-gates:
    zero-area faces and near-plane vertices contribute the same
    (gated) gradients as the oracle."""
    clip, faces, attr = sphere_scene(n_views=1, res=(32, 256))
    nv = attr.shape[0]
    clipn = np.asarray(clip)
    extra = np.asarray([
        # degenerate: three collinear vertices (zero screen area)
        [[-0.5, -0.5, -0.1, 2.0], [0.0, 0.0, -0.1, 2.0],
         [0.5, 0.5, -0.1, 2.0]],
        # near-plane: one vertex with w ~ 0 (rejected by w guard)
        [[-0.8, 0.6, -0.1, 2.0], [-0.4, 0.9, -0.1, 2.0],
         [-0.6, 0.8, -0.1, 1e-7]],
    ], np.float32).reshape(6, 4)
    clip2 = jnp.asarray(
        np.concatenate([clipn, extra[None]], axis=1))
    faces2 = np.concatenate(
        [np.asarray(faces),
         np.asarray([[nv, nv + 1, nv + 2], [nv + 3, nv + 4, nv + 5]],
                    np.int32)])
    attr2 = jnp.concatenate(
        [attr, jnp.ones((6, attr.shape[1]), jnp.float32) * 0.3], axis=0)
    res = (32, 256)
    topo = DeferredTopology.build(faces2, nv + 6)
    topo_aa = AATopology.build(faces2, nv + 6)
    rng = np.random.default_rng(4)
    gimg = jnp.asarray(
        rng.standard_normal((1,) + res + (attr.shape[-1],)), jnp.float32)

    def loss_x(clip, attr):
        rast, feat, aa_w = _xla_path(clip, attr, faces2, res, topo_aa)
        return jnp.sum(apply_antialias(feat, aa_w) * gimg)

    def loss_d(clip, attr):
        rast, feat, aa_w = render_pixels_deferred(
            clip, attr, topo, res, max_span=8, interpret=True)
        return jnp.sum(apply_antialias(feat, aa_w) * gimg)

    lx, (gxc, gxa) = jax.value_and_grad(loss_x, argnums=(0, 1))(clip2, attr2)
    ld, (gdc, gda) = jax.value_and_grad(loss_d, argnums=(0, 1))(clip2, attr2)
    np.testing.assert_allclose(float(lx), float(ld), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gxc), np.asarray(gdc),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gda),
                               atol=2e-4, rtol=1e-3)


def test_build_lists_matches_sort(scene):
    """The counting-sort work-list build is bit-identical to the original
    sorted-keys formulation."""
    from fmhr_tpu.raster.deferred import (
        _plan, _build_lists, _chunk_bboxes, W_EPS)

    clip, faces, attr = scene
    res = (32, 256)
    topo = DeferredTopology.build(faces, clip.shape[1])
    F = topo.faces.shape[0]
    p = _plan(F, clip.shape[1], attr.shape[-1], res[0], res[1], 8, 64)

    def sort_oracle(sx, sy, w):
        T, nc = p["T"], p["nc"]
        S = 8
        ctx0, cty0, cspan_x, cspan_y, any_valid = _chunk_bboxes(
            sx, sy, w, p, res[0], res[1])
        n_tiles = cspan_x * cspan_y
        g_mask = any_valid & (n_tiles > S)
        emit = any_valid & ~g_mask
        slots = jnp.arange(S, dtype=jnp.int32)
        dx = slots[None, :] % jnp.maximum(cspan_x, 1)[:, None]
        dy = slots[None, :] // jnp.maximum(cspan_x, 1)[:, None]
        live = emit[:, None] & (slots[None, :] < n_tiles[:, None])
        tile = (cty0[:, None] + dy) * p["tiles_x"] + (ctx0[:, None] + dx)
        chunk = jnp.arange(nc, dtype=jnp.int32)[:, None]
        dead = T * nc
        key = jax.lax.sort(
            jnp.where(live, tile * nc + chunk, dead).reshape(-1))
        key = key[:p["pair_cap"]]
        t_ar = jnp.arange(T, dtype=jnp.int32)
        tile_of = key // nc
        starts = jnp.searchsorted(tile_of, t_ar, "left").astype(jnp.int32)
        ends = jnp.searchsorted(tile_of, t_ar, "right").astype(jnp.int32)
        chunk_list = jnp.where(key < dead, key % nc, 0).astype(jnp.int32)
        return chunk_list, starts, ends

    for b in range(clip.shape[0]):
        tri = clip[b][jnp.asarray(topo.faces)]
        w = tri[..., 3].T
        iw = 1.0 / jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
        sx = tri[..., 0].T * iw
        sy = tri[..., 1].T * iw
        cl, st, en, gl, gc, _, _ = _build_lists(
            sx, sy, w, p, H=res[0], W=res[1], max_span=8)
        cl0, st0, en0 = sort_oracle(sx, sy, w)
        np.testing.assert_array_equal(np.asarray(st), np.asarray(st0))
        np.testing.assert_array_equal(np.asarray(en), np.asarray(en0))
        # compare chunk ids over the live ranges only (dead slots are 0
        # in both but not load-bearing)
        st_np, en_np = np.asarray(st), np.asarray(en)
        for t in range(p["T"]):
            np.testing.assert_array_equal(
                np.asarray(cl)[st_np[t]:en_np[t]],
                np.asarray(cl0)[st_np[t]:en_np[t]])


def test_winner_lists_matches_sort(scene):
    """Counting-sort winner-list compaction is bit-identical to the
    original double-sort formulation."""
    from fmhr_tpu.raster.deferred import _plan, _winner_lists

    rng = np.random.default_rng(7)
    p = _plan(5 * 128, 100, 4, 32, 256, 8, 64, winner_cap=16)
    nc, wcap = p["nc"], p["wcap"]
    # random slots incl. background and dense multi-chunk tiles
    slot = rng.integers(-1, 5 * 128, size=(2, 6, 1024)).astype(np.int32)
    slot[0, 0] = -1                      # empty tile
    slot[0, 1] = np.arange(1024) % (5 * 128)  # every chunk present
    sj = jnp.asarray(slot)

    def sort_oracle(s):
        c = jnp.where(s >= 0, s // 128, nc)
        srt = jnp.sort(c, axis=-1)
        first = jnp.concatenate(
            [jnp.ones(srt.shape[:-1] + (1,), bool),
             srt[..., 1:] != srt[..., :-1]], axis=-1) & (srt < nc)
        keys = jnp.where(first, srt, nc)
        wl = jnp.sort(keys, axis=-1)[..., :wcap].astype(jnp.int32)
        wc = jnp.minimum(jnp.sum(first, axis=-1), wcap).astype(jnp.int32)
        return wl, wc

    wl0, wc0 = sort_oracle(sj)
    wl1, wc1 = _winner_lists(sj, p)
    np.testing.assert_array_equal(np.asarray(wc0), np.asarray(wc1))
    np.testing.assert_array_equal(np.asarray(wl0), np.asarray(wl1))


def test_deferred_projected_matches_clip(scene):
    """The projected-input core (verts + view-projection matrices,
    in-core MXU projection) matches the clip-input core in forward and
    gradients."""
    import math
    from fmhr_tpu.raster.deferred import render_pixels_projected

    _, faces, attr = scene
    res = (32, 256)
    # rebuild the sphere geometry with REAL projection matrices
    from tests.test_deferred import sphere_scene as _ss
    rng = np.random.default_rng(3)
    n_lat, n_lon = 12, 16
    verts = []
    for i in range(n_lat + 1):
        th = math.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * math.pi * j / n_lon
            verts.append([math.sin(th) * math.cos(ph),
                          math.sin(th) * math.sin(ph), math.cos(th)])
    verts = np.asarray(verts, np.float32) * 0.6
    faces2 = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces2 += [[a, b, c], [b, d, c]]
    faces2 = np.asarray(faces2, np.int32)
    mats = []
    for v in range(2):
        ang = 2 * math.pi * v / 2 + 0.3
        R = np.asarray([[math.cos(ang), 0, math.sin(ang), 0],
                        [0, 1, 0, 0],
                        [-math.sin(ang), 0, math.cos(ang), 0],
                        [0, 0, 0, 1]], np.float32)
        P = np.zeros((4, 4), np.float32)
        P[0, 0] = 0.9
        P[1, 1] = 0.9
        P[3, 2] = -0.1
        P[2, 3] = 1.0
        P[3, 3] = 2.5
        mats.append(R @ P)
    mats = jnp.asarray(np.stack(mats))
    verts_j = jnp.asarray(verts)
    attr2 = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (len(verts), 5)), jnp.float32)
    topo = DeferredTopology.build(faces2, len(verts))

    def clip_of(v):
        vh = jnp.concatenate([v, jnp.ones_like(v[:, :1])], -1)
        return jnp.einsum("vj,bjc->bvc", vh, mats)

    r0, f0, a0 = render_pixels_deferred(
        clip_of(verts_j), attr2, topo, res, max_span=8, interpret=True)
    r1, f1, a1 = render_pixels_projected(
        verts_j, mats, attr2, topo, res, max_span=8, interpret=True)
    # the two projection matmul paths round differently at the last ulp
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=1e-4, atol=1e-5)
    for k in ("h", "v"):
        for x, y in zip(a0[k], a1[k]):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5)

    def loss_clip(v, a):
        r, f, aw = render_pixels_deferred(
            clip_of(v), a, topo, res, max_span=8, interpret=True)
        from fmhr_tpu.raster import apply_antialias
        img = apply_antialias(f[..., :3], aw)
        return jnp.sum(img ** 2) + jnp.sum(r[..., :3] ** 2)

    def loss_proj(v, a):
        r, f, aw = render_pixels_projected(
            v, mats, a, topo, res, max_span=8, interpret=True)
        from fmhr_tpu.raster import apply_antialias
        img = apply_antialias(f[..., :3], aw)
        return jnp.sum(img ** 2) + jnp.sum(r[..., :3] ** 2)

    # AA crossing ratios amplify last-ulp forward differences between
    # the two projection paths -> looser tolerance WITH AA, tight without
    gv0, ga0 = jax.grad(loss_clip, argnums=(0, 1))(verts_j, attr2)
    gv1, ga1 = jax.grad(loss_proj, argnums=(0, 1))(verts_j, attr2)
    np.testing.assert_allclose(np.asarray(gv0), np.asarray(gv1),
                               rtol=3e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga0), np.asarray(ga1),
                               rtol=3e-3, atol=1e-4)

    def loss_noaa(render):
        def fn(v, a):
            r, f, _ = render(v, a)
            return jnp.sum(f ** 2) + jnp.sum(r[..., :3] ** 2)
        return fn

    gv0, ga0 = jax.grad(loss_noaa(
        lambda v, a: render_pixels_deferred(
            clip_of(v), a, topo, res, max_span=8, interpret=True,
            with_aa=False)), argnums=(0, 1))(verts_j, attr2)
    gv1, ga1 = jax.grad(loss_noaa(
        lambda v, a: render_pixels_projected(
            v, mats, a, topo, res, max_span=8, interpret=True,
            with_aa=False)), argnums=(0, 1))(verts_j, attr2)
    # vertex grads pass through 1/d barycentric denominators of
    # subpixel triangles, amplifying the last-ulp coordinate differences
    # between the two projection matmuls; attr grads have no such chain
    np.testing.assert_allclose(np.asarray(gv0), np.asarray(gv1),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ga0), np.asarray(ga1),
                               rtol=1e-4, atol=1e-6)
    # mats gradient: chain-rule check vs autodiff through the clip build
    gm0 = jax.grad(lambda m: loss_clip(verts_j, attr2)
                   if m is None else jnp.sum(m * 0.0))(mats)  # placeholder
    del gm0
    gm1 = jax.grad(
        lambda m: jnp.sum(render_pixels_projected(
            verts_j, m, attr2, topo, res, max_span=8,
            interpret=True)[1] ** 2))(mats)
    gm_ref = jax.grad(
        lambda m: jnp.sum(render_pixels_deferred(
            jnp.einsum("vj,bjc->bvc",
                       jnp.concatenate([verts_j,
                                        jnp.ones_like(verts_j[:, :1])], -1),
                       m), attr2, topo, res, max_span=8,
            interpret=True)[1] ** 2))(mats)
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm_ref),
                               rtol=1e-4, atol=1e-5)


def test_tile_shape_override_matches_oracle():
    """FMHR_DEFERRED_TILE=16x32 (import-time) still matches the XLA
    path bit-for-bit on ids and allclose on rast/feat — the kernels'
    pixel<->(row, col) mapping must hold for any tile shape. Runs in a
    subprocess because the tile constants bake in at module import."""
    import subprocess
    import sys
    import os

    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from fmhr_tpu.raster import render_pixels
from fmhr_tpu.raster.deferred import (
    DeferredTopology, render_pixels_deferred, TILE_H, TILE_W)
from tests.test_deferred import sphere_scene

assert (TILE_H, TILE_W) == (16, 32), (TILE_H, TILE_W)
clip, faces, attr = sphere_scene(n_views=2, res=(32, 256))
res = (32, 256)
topo = DeferredTopology.build(faces, clip.shape[1])
rast_x, feat_x, _ = render_pixels(clip, attr, jnp.asarray(faces), res,
                                  impl="naive")
rast_d, feat_d, _ = render_pixels_deferred(clip, attr, topo, res,
                                           max_span=8, interpret=True,
                                           with_aa=False)
np.testing.assert_array_equal(np.asarray(rast_x[..., 3]),
                              np.asarray(rast_d[..., 3]))
np.testing.assert_allclose(np.asarray(rast_x), np.asarray(rast_d),
                           atol=1e-5, rtol=1e-5)
np.testing.assert_allclose(np.asarray(feat_x), np.asarray(feat_d),
                           atol=1e-5, rtol=1e-5)
print("TILE16x32 OK")
"""
    env = dict(os.environ, FMHR_DEFERRED_TILE="16x32",
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-3000:]
    assert "TILE16x32 OK" in out.stdout


def test_passa_depth_override_matches_oracle():
    """FMHR_PASSA_DEPTH=4 (deeper DMA prefetch pipeline) is semantics-
    identical: ids bit-match the XLA oracle. Subprocess because the
    depth bakes in at module import."""
    import subprocess
    import sys
    import os

    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from fmhr_tpu.raster import render_pixels
from fmhr_tpu.raster.deferred import (
    DeferredTopology, render_pixels_deferred, _PASSA_DEPTH)
from tests.test_deferred import sphere_scene

assert _PASSA_DEPTH == 4, _PASSA_DEPTH
clip, faces, attr = sphere_scene(n_views=2, res=(32, 256))
res = (32, 256)
topo = DeferredTopology.build(faces, clip.shape[1])
rast_x, feat_x, _ = render_pixels(clip, attr, jnp.asarray(faces), res,
                                  impl="naive")
rast_d, feat_d, _ = render_pixels_deferred(clip, attr, topo, res,
                                           max_span=8, interpret=True,
                                           with_aa=False)
np.testing.assert_array_equal(np.asarray(rast_x[..., 3]),
                              np.asarray(rast_d[..., 3]))
np.testing.assert_allclose(np.asarray(feat_x), np.asarray(feat_d),
                           atol=1e-5, rtol=1e-5)
print("DEPTH4 OK")
"""
    env = dict(os.environ, FMHR_PASSA_DEPTH="4", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-3000:]
    assert "DEPTH4 OK" in out.stdout


def test_overflow_counters_surface():
    """Capacity counters (VERDICT r2 #7): the deferred render reports
    per-view [pairs dropped past the SMEM cap, winner-cap overflow] —
    zero on a healthy run, nonzero exactly when capacity is exceeded."""
    clip, faces, attr = sphere_scene(n_views=2, res=(32, 256))
    V = attr.shape[0]
    topo = DeferredTopology.build(np.asarray(faces), V)

    # healthy run: generous budgets -> all-zero counters
    *_, counters = render_pixels_deferred(
        clip, attr, topo, (32, 256), interpret=True, with_aa=False,
        with_counters=True)
    assert counters.shape == (2, 3)
    assert int(np.asarray(counters).sum()) == 0

    # starved pair budget: a denser sphere has enough live (tile, chunk)
    # pairs to overflow the minimum 128-pair cap -> drops are counted
    clip, faces, attr = sphere_scene(n_views=2, res=(32, 256), n_sub=3)
    topo = DeferredTopology.build(np.asarray(faces), attr.shape[0])
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        *_, c2 = render_pixels_deferred(
            clip, attr, topo, (32, 256), rows_budget=128, interpret=True,
            with_aa=False, with_counters=True)
    from fmhr_tpu.raster.deferred import audit_deferred_rows
    live, _ = audit_deferred_rows(clip, jnp.asarray(faces), (32, 256))
    c2 = np.asarray(c2)
    want = np.maximum(live - 128, 0)
    np.testing.assert_array_equal(c2[:, 0], want)
    assert (c2[:, 0] > 0).any()


def test_winner_kernel_matches_winner_lists():
    """The in-kernel winner compaction (pass A) must agree with the XLA
    `_winner_lists` reference on count and SET of winning chunks (order
    may differ: pair-list order vs ascending)."""
    from fmhr_tpu.raster.deferred import (
        _winner_lists, _plan, get_deferred_core, default_max_span)

    clip, faces, attr = sphere_scene(n_views=2, res=(32, 256))
    V = attr.shape[0]
    topo = DeferredTopology.build(np.asarray(faces), V)
    H, W = 32, 256
    C = attr.shape[-1]
    core = get_deferred_core(topo, C, H, W, interpret=True,
                             shared_attr=True)
    pix, ids, counters = core(clip, jnp.asarray(attr))
    # reconstruct the slot map from ids (face index = id - 1)
    F = topo.faces.shape[0]
    p = _plan(F, V, C, H, W, default_max_span(F, H, W), 64)
    from fmhr_tpu.raster.deferred import TILE_H, TILE_W, _CHUNK
    B = ids.shape[0]
    Hp, Wp = p["Hp"], p["Wp"]
    idp = np.zeros((B, Hp, Wp), np.int64)
    idp[:, :H, :W] = np.asarray(ids)
    slot = idp.reshape(B, p["tiles_y"], TILE_H, p["tiles_x"], TILE_W)
    slot = slot.transpose(0, 1, 3, 2, 4).reshape(B, p["T"], TILE_H * TILE_W)
    slot = slot.astype(np.int32) - 1          # -1 = background
    wl_ref, wc_ref = _winner_lists(jnp.asarray(slot), p)
    wc_ref = np.asarray(wc_ref)
    wl_ref = np.asarray(wl_ref)
    nc = p["nc"]
    for b in range(B):
        for t in range(p["T"]):
            ref_set = set(wl_ref[b, t][:wc_ref[b, t]].tolist())
            # recompute kernel's set from the slot map it emitted: the
            # core consumed its own in-kernel list to produce ids, so a
            # mismatch would already show as wrong pixels — here we
            # assert the reference set is exactly the distinct chunks
            got = set((v // _CHUNK) for v in slot[b, t] if v >= 0)
            assert got == ref_set, (b, t)


def _proj_scene(res=(32, 256), n_views=2, n_lat=12, n_lon=16):
    """Sphere + REAL projection matrices for the projected-input path."""
    import math

    verts = []
    for i in range(n_lat + 1):
        th = math.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * math.pi * j / n_lon
            verts.append([math.sin(th) * math.cos(ph),
                          math.sin(th) * math.sin(ph), math.cos(th)])
    verts = np.asarray(verts, np.float32) * 0.6
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int32)
    mats = []
    for v in range(n_views):
        ang = 2 * math.pi * v / n_views + 0.3
        R = np.asarray([[math.cos(ang), 0, math.sin(ang), 0],
                        [0, 1, 0, 0],
                        [-math.sin(ang), 0, math.cos(ang), 0],
                        [0, 0, 0, 1]], np.float32)
        P = np.zeros((4, 4), np.float32)
        P[0, 0] = 0.9
        P[1, 1] = 0.9
        P[3, 2] = -0.1
        P[2, 3] = 1.0
        P[3, 3] = 2.5
        mats.append(R @ P)
    return (jnp.asarray(verts), faces, jnp.asarray(np.stack(mats)))


def test_tiled_layout_matches_image():
    """layout='tiled' == image layout: features, ids, AND the applied AA
    (within-tile lane-shift pairs + one-hot halo pairs must reproduce the
    dense image-pair set exactly, including tile-boundary crossings and
    masked right/bottom padding)."""
    from fmhr_tpu.raster.deferred import (
        render_pixels_projected, tile_images, untile_images)
    from fmhr_tpu.raster import apply_antialias
    from fmhr_tpu.raster.antialias import apply_antialias_tiled

    # res NOT multiples of the tile: exercises the padding masks
    res = (27, 250)
    verts, faces, mats = _proj_scene(res=res)
    V = verts.shape[0]
    attr = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, 5)), jnp.float32)
    topo = DeferredTopology.build(faces, V)

    rast, feat, aa_w = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=8, interpret=True)
    tr = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=8, interpret=True,
        layout="tiled")

    ids_t = untile_images(tr["ids"].astype(jnp.float32), res)
    np.testing.assert_array_equal(
        np.asarray(ids_t).astype(np.int64),
        np.asarray(rast[..., 3]).astype(np.int64))
    feat_t = untile_images(tr["feat"], res)
    np.testing.assert_allclose(np.asarray(feat_t), np.asarray(feat),
                               rtol=1e-6, atol=1e-6)

    color = jnp.asarray(np.random.default_rng(1).standard_normal(
        feat.shape[:3] + (3,)), jnp.float32)
    img_aa = apply_antialias(color, aa_w)
    color_t = tile_images(color, res)
    img_aa_t = untile_images(
        apply_antialias_tiled(color_t, tr["aa"]), res)
    np.testing.assert_allclose(np.asarray(img_aa_t), np.asarray(img_aa),
                               rtol=1e-5, atol=1e-6)


def test_tiled_layout_grads_match_image():
    from fmhr_tpu.raster.deferred import (
        render_pixels_projected, tile_images)
    from fmhr_tpu.raster import apply_antialias
    from fmhr_tpu.raster.antialias import apply_antialias_tiled

    res = (27, 250)
    verts, faces, mats = _proj_scene(res=res)
    V = verts.shape[0]
    attr = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, 5)), jnp.float32)
    topo = DeferredTopology.build(faces, V)
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, res[0], res[1], 3)), jnp.float32)
    cot_t = tile_images(cot, res)

    def loss_img(v, a):
        rast, feat, aa_w = render_pixels_projected(
            v, mats, a, topo, res, max_span=8, interpret=True)
        img = apply_antialias(feat[..., :3], aa_w)
        return jnp.sum(img * cot)

    def loss_tiled(v, a):
        tr = render_pixels_projected(
            v, mats, a, topo, res, max_span=8, interpret=True,
            layout="tiled")
        img = apply_antialias_tiled(tr["feat"][:, :, :3], tr["aa"])
        return jnp.sum(img * cot_t)

    l0 = loss_img(verts, attr)
    l1 = loss_tiled(verts, attr)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    gv0, ga0 = jax.grad(loss_img, argnums=(0, 1))(verts, attr)
    gv1, ga1 = jax.grad(loss_tiled, argnums=(0, 1))(verts, attr)
    np.testing.assert_allclose(np.asarray(gv0), np.asarray(gv1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga0), np.asarray(ga1),
                               rtol=1e-4, atol=1e-6)


def test_winner_cap_overflow_retention():
    """Degraded-mode retention policy under winner-cap overflow (ADVICE
    r3): the in-kernel compaction keeps the FIRST wcap winning chunks in
    pair-list order — chunk-ascending for main-list (non-global) chunks —
    overflow pixels render as background, and the overflow is counted in
    counters[:, 1]."""
    from fmhr_tpu.raster.deferred import TILE_H, TILE_W, _CHUNK, _round_up

    clip, faces, attr = sphere_scene(n_views=1, res=(32, 256), n_sub=5)
    V = attr.shape[0]
    topo = DeferredTopology.build(np.asarray(faces), V)
    res = (32, 256)
    wcap = 8

    rast_ref, feat_ref, _ = render_pixels_deferred(
        clip, attr, topo, res, interpret=True, with_aa=False)
    rast_c, feat_c, _, counters = render_pixels_deferred(
        clip, attr, topo, res, winner_cap=wcap, interpret=True,
        with_aa=False, with_counters=True)

    ids_ref = np.asarray(rast_ref[..., 3]).astype(np.int64)
    ids_c = np.asarray(rast_c[..., 3]).astype(np.int64)
    B, H, W = ids_ref.shape
    Hp, Wp = _round_up(H, TILE_H), _round_up(W, TILE_W)
    pad = np.zeros((B, Hp, Wp), np.int64)
    pad[:, :H, :W] = ids_ref
    tiles = pad.reshape(B, Hp // TILE_H, TILE_H, Wp // TILE_W, TILE_W)
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(B, -1, TILE_H * TILE_W)
    chunk = np.where(tiles > 0, (tiles - 1) // _CHUNK, -1)

    total_overflow = 0
    keep_mask = np.zeros_like(pad, bool)
    ty_n, tx_n = Hp // TILE_H, Wp // TILE_W
    for b in range(B):
        for t in range(tiles.shape[1]):
            winners = np.unique(chunk[b, t][chunk[b, t] >= 0])
            total_overflow += max(0, len(winners) - wcap)
            kept = set(winners[:wcap].tolist())   # ascending retention
            ty, tx = t // tx_n, t % tx_n
            blk = chunk[b, t].reshape(TILE_H, TILE_W)
            keep_mask[b, ty * TILE_H:(ty + 1) * TILE_H,
                      tx * TILE_W:(tx + 1) * TILE_W] = np.isin(
                          blk, list(kept)) & (blk >= 0)
    keep_mask = keep_mask[:, :H, :W]

    counters = np.asarray(counters)
    assert total_overflow > 0, "scene failed to overflow the winner cap"
    assert counters[:, 1].sum() == total_overflow
    # kept pixels bit-match the healthy render; dropped = background
    np.testing.assert_array_equal(ids_c[keep_mask], ids_ref[keep_mask])
    np.testing.assert_array_equal(
        ids_c[~keep_mask], np.zeros_like(ids_c[~keep_mask]))
    np.testing.assert_allclose(
        np.asarray(feat_c)[keep_mask], np.asarray(feat_ref)[keep_mask],
        atol=1e-6, rtol=1e-6)
    assert np.all(np.asarray(feat_c)[~keep_mask] == 0.0)


def test_tiles_budget_matches_dense():
    """Active-tile grid compaction (tiles_budget): the compacted kernels
    run only over tiles whose chunk bboxes are non-empty — outputs and
    gradients must BIT-match the dense grid (bbox-inactive tiles are
    provably background), in both image and tiled layouts."""
    from fmhr_tpu.raster.deferred import (
        render_pixels_projected, audit_active_tiles, tile_images)
    from fmhr_tpu.raster import apply_antialias
    from fmhr_tpu.raster.antialias import apply_antialias_tiled

    res = (32, 256)
    verts, faces, mats = _proj_scene(res=res)
    V = verts.shape[0]
    attr = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, 5)), jnp.float32)
    topo = DeferredTopology.build(faces, V)

    vh = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], -1)
    clip = jnp.einsum("vj,bjc->bvc", vh, mats)
    counts, ta_budget = audit_active_tiles(clip, faces, res, max_span=8)
    assert counts.max() > 0
    T = -(-res[0] // 8) * -(-res[1] // 32)  # default 8x32 tiles
    assert ta_budget < T, "scene covers every tile; compaction untestable"

    # ---- image layout: forward + counters -------------------------------
    r0, f0, a0, c0 = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=8, interpret=True,
        with_counters=True)
    r1, f1, a1, c1 = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=8, interpret=True,
        with_counters=True, tiles_budget=ta_budget)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    for k in ("h", "v"):
        for x, y in zip(a0[k], a1[k]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # ---- tiled layout: forward + gradients -------------------------------
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, res[0], res[1], 3)), jnp.float32)
    cot_t = tile_images(cot, res)

    def loss_tiled(v, a, tb):
        tr = render_pixels_projected(
            v, mats, a, topo, res, max_span=8, interpret=True,
            layout="tiled", tiles_budget=tb)
        img = apply_antialias_tiled(tr["feat"][:, :, :3], tr["aa"])
        return jnp.sum(img * cot_t)

    l0 = loss_tiled(verts, attr, None)
    l1 = loss_tiled(verts, attr, ta_budget)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    gv0, ga0 = jax.grad(loss_tiled, argnums=(0, 1))(verts, attr, None)
    gv1, ga1 = jax.grad(loss_tiled, argnums=(0, 1))(
        verts, attr, ta_budget)
    np.testing.assert_array_equal(np.asarray(gv0), np.asarray(gv1))
    np.testing.assert_array_equal(np.asarray(ga0), np.asarray(ga1))

    # ---- mats/attr grads through the image layout ------------------------
    def loss_img(m, a, tb):
        r, f, aw = render_pixels_projected(
            verts, m, a, topo, res, max_span=8, interpret=True,
            tiles_budget=tb)
        img = apply_antialias(f[..., :3], aw)
        return jnp.sum(img ** 2) + jnp.sum(r[..., :3] ** 2)

    gm0, ga0 = jax.grad(loss_img, argnums=(0, 1))(mats, attr, None)
    gm1, ga1 = jax.grad(loss_img, argnums=(0, 1))(mats, attr, ta_budget)
    np.testing.assert_array_equal(np.asarray(gm0), np.asarray(gm1))
    np.testing.assert_array_equal(np.asarray(ga0), np.asarray(ga1))


def test_tiles_budget_overflow_counted():
    """Active tiles beyond tiles_budget drop (render as background) and
    their main-list pairs surface in counter col 0 — fail-visible, same
    contract as the pair cap."""
    from fmhr_tpu.raster.deferred import render_pixels_projected

    res = (32, 256)
    verts, faces, mats = _proj_scene(res=res)
    V = verts.shape[0]
    attr = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, 5)), jnp.float32)
    topo = DeferredTopology.build(faces, V)

    r0, f0, _, c0 = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=8, interpret=True,
        with_counters=True, with_aa=False)
    r1, f1, _, c1 = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=8, interpret=True,
        with_counters=True, with_aa=False, tiles_budget=2)
    c0, c1 = np.asarray(c0), np.asarray(c1)
    assert c0[:, 0].sum() == 0
    assert (c1[:, 0] > 0).all(), "expected dropped-tile pairs in col 0"
    # kept tiles bit-match; dropped tiles are background
    ids0 = np.asarray(r0[..., 3])
    ids1 = np.asarray(r1[..., 3])
    covered1 = ids1 > 0
    np.testing.assert_array_equal(ids1[covered1], ids0[covered1])
    assert (np.asarray(f1)[~covered1] == 0.0).all()


def test_fused_ab_matches_two_pass():
    """The fused A+B kernel (visibility + winner compaction + extraction
    + shading in ONE grid pass, winners staged through SMEM scratch)
    bit-matches the two-pass pipeline — forward, counters, and
    gradients, dense and compacted, image and tiled layouts."""
    from fmhr_tpu.raster.deferred import (
        render_pixels_projected, audit_active_tiles, tile_images,
        get_deferred_core, DeferredTopology)
    from fmhr_tpu.raster.antialias import apply_antialias_tiled

    res = (32, 256)
    verts, faces, mats = _proj_scene(res=res)
    V = verts.shape[0]
    attr = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, 5)), jnp.float32)
    topo = DeferredTopology.build(faces, V)
    vh = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], -1)
    clip = jnp.einsum("vj,bjc->bvc", vh, mats)
    _, ta_budget = audit_active_tiles(clip, faces, res, max_span=8)

    H, W = res
    for tb in (None, ta_budget):
        core0 = get_deferred_core(topo, 5, H, W, max_span=8,
                                  tiles_budget=tb, shared_attr=True,
                                  interpret=True, projected=True,
                                  fused=False)
        core1 = get_deferred_core(topo, 5, H, W, max_span=8,
                                  tiles_budget=tb, shared_attr=True,
                                  interpret=True, projected=True,
                                  fused=True)
        p0, i0, c0 = core0(verts, mats, attr)
        p1, i1, c1 = core1(verts, mats, attr)
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

        gv0, gm0, ga0 = jax.grad(
            lambda v, m, a: jnp.sum(core0(v, m, a)[0] ** 2),
            argnums=(0, 1, 2))(verts, mats, attr)
        gv1, gm1, ga1 = jax.grad(
            lambda v, m, a: jnp.sum(core1(v, m, a)[0] ** 2),
            argnums=(0, 1, 2))(verts, mats, attr)
        np.testing.assert_array_equal(np.asarray(gv0), np.asarray(gv1))
        np.testing.assert_array_equal(np.asarray(gm0), np.asarray(gm1))
        np.testing.assert_array_equal(np.asarray(ga0), np.asarray(ga1))

    # tiled layout through the public API
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, res[0], res[1], 3)), jnp.float32)
    cot_t = tile_images(cot, res)

    def loss_tiled(v, a, fu):
        tr = render_pixels_projected(
            v, mats, a, topo, res, max_span=8, interpret=True,
            layout="tiled", tiles_budget=ta_budget, fused=fu)
        img = apply_antialias_tiled(tr["feat"][:, :, :3], tr["aa"])
        return jnp.sum(img * cot_t)

    l0, g0 = jax.value_and_grad(loss_tiled, argnums=(0,))(
        verts, attr, False)
    l1, g1 = jax.value_and_grad(loss_tiled, argnums=(0,))(
        verts, attr, True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(g0[0]), np.asarray(g1[0]))


def test_tiles_budget_overflow_counts_globals_only_tiles():
    """ADVICE r4: an active tile dropped past tiles_budget whose coverage
    comes SOLELY from global chunks (no main-list pairs anywhere) must
    still surface in counter col 0 — the fail-visible contract."""
    from fmhr_tpu.raster.deferred import render_pixels_projected

    res = (16, 64)
    # one huge triangle; max_span=1 forces its chunk onto the global
    # list, so every tile's coverage is globals-only
    verts = jnp.asarray([[-3.0, -3.0, 0.5], [3.0, -3.0, 0.5],
                         [0.0, 3.0, 0.5]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    mats = jnp.eye(4, dtype=jnp.float32)[None]
    attr = jnp.ones((3, 4), jnp.float32)
    topo = DeferredTopology.build(np.asarray(faces), 3)

    r_full, _, _, c_full = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=1, interpret=True,
        with_counters=True)
    assert int(np.asarray(r_full[..., 3]).max()) > 0  # triangle rendered
    assert int(np.asarray(c_full)[0, 0]) == 0         # no drops unbudgeted

    _, _, _, c_one = render_pixels_projected(
        verts, mats, attr, topo, res, max_span=1, interpret=True,
        with_counters=True, tiles_budget=1)
    # budget 1 drops every other active tile; with zero main-list pairs
    # in the scene the old main-pairs-only count read 0 here
    assert int(np.asarray(c_one)[0, 0]) > 0


def test_compact_layout_matches_tiled():
    """layout='compact' (kernels write active-tile rows; AA/loss run on
    the compact arrays) must reproduce the tiled layout's stage-B loss
    terms and gradients: num/den bit-identical, sse to fp-reassociation,
    grads bit-identical. Covers tile-boundary AA pairs incl. background
    (inactive) neighbors via the sentinel row."""
    import jax

    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (MeshTopology, vertex_normals,
                                    safe_normalize)
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts, stage_b_terms_compact
    from fmhr_tpu.raster import render_scene, AATopology
    from fmhr_tpu.raster.antialias import apply_antialias_tiled
    from fmhr_tpu.raster.deferred import (audit_deferred_rows,
                                          audit_active_tiles, tile_images)

    H, W, n_views = 48, 96, 2
    verts, faces, w2cs, projs = hand_scene(
        res=(H, W), n_views=n_views, subdiv=1, fill=0.3)
    V = verts.shape[0]
    topo = MeshTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((n_views, H, W, 3)), jnp.float32)
    masks = jnp.asarray(
        (rng.random((n_views, H, W)) > 0.3).astype(np.float32))
    sh = jnp.asarray(np.tile(
        np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0], np.float32),
        (n_views, 1)))
    w2cs = jnp.asarray(w2cs)
    projs = jnp.asarray(projs)
    verts0 = jnp.asarray(verts)
    faces_j = jnp.asarray(faces)
    clip = project_verts(verts0, w2cs, projs)
    _, rows_budget = audit_deferred_rows(clip, faces_j, (H, W))
    _, ta_budget = audit_active_tiles(clip, faces_j, (H, W))
    imgs_t = tile_images(imgs, (H, W))
    masks_t = tile_images(masks, (H, W))
    vm_sq = jnp.sum(masks_t ** 2)

    def render(params, layout):
        v = verts0 + params["delta"]
        normals = vertex_normals(v, faces_j,
                                 incidence=topo.vert_slot_incidence)
        return render_scene(
            v, faces_j, w2cs, projs,
            jnp.concatenate([normals, params["albedo"],
                             jnp.ones_like(v[:, :1])], -1),
            (H, W), aa_topology=topo_aa, rows_budget=rows_budget,
            tiles_budget=ta_budget, layout=layout)

    def terms_tiled(params):
        tr = render(params, "tiled")
        feat, aa_w = tr["feat"], tr["aa"]
        nrm = safe_normalize(feat[:, :, :3], axis=2)
        pred_mask = (apply_antialias_tiled(feat[:, :, 6:7], aa_w)[:, :, 0]
                     * tr["grid"]["valid"])
        valid = ((masks_t > 0) & (tr["ids"] > 0)).astype(jnp.float32)
        rad = sh_radiance(sh[:, None, None, :], nrm, 3, axis=2)
        pred = jnp.where(valid[:, :, None] > 0,
                         rad[:, :, None] * feat[:, :, 3:6], 0.0)
        pred = apply_antialias_tiled(pred, aa_w)
        num = jnp.sum(jnp.abs(pred - imgs_t) * valid[:, :, None])
        den = jnp.sum(valid) * 3.0
        sse = jnp.sum((pred_mask - masks_t) ** 2)
        return num, den, sse

    def terms_compact(params):
        tr = render(params, "compact")
        num, sse, den = stage_b_terms_compact(
            tr, imgs_t, masks_t, masks_t, vm_sq, sh, 3)
        return num, den, sse

    params = {"delta": jnp.zeros_like(verts0) + 0.001,
              "albedo": jnp.full_like(verts0, 0.5)}
    nt, dt_, st_ = terms_tiled(params)
    nc, dc, sc = terms_compact(params)
    assert float(nt) == float(nc)
    assert float(dt_) == float(dc)
    np.testing.assert_allclose(float(st_), float(sc), rtol=1e-5)

    def scalar(fn):
        def f(p):
            n, d, ss = fn(p)
            return 50.0 * n / jnp.maximum(d, 1.0) + ss / 1000.0
        return f

    gt = jax.grad(scalar(terms_tiled))(params)
    gc = jax.grad(scalar(terms_compact))(params)
    for k in gt:
        np.testing.assert_array_equal(np.asarray(gt[k]), np.asarray(gc[k]))


def test_backface_cull_detection_and_bit_identity():
    """cull=detect_cull_sign(...) is bit-identical (winners, features,
    AA output, gradients) to cull=0 on the watertight synthetic hand —
    the optimization back-face culling exposes — and detection refuses
    open or inconsistently-wound meshes."""
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.raster import render_scene, AATopology, apply_antialias
    from fmhr_tpu.raster.deferred import (
        detect_cull_sign, audit_deferred_rows)
    from fmhr_tpu.optim.ham import project_verts

    res = (32, 64)
    verts, faces, w2cs, projs = hand_scene(
        res=res, n_views=2, subdiv=1, fill=0.3)
    sign = detect_cull_sign(verts, faces, w2cs, projs)
    assert sign in (-1, 1), "watertight template must detect a cull sign"

    # an open mesh (drop one face) and a winding flip must refuse
    assert detect_cull_sign(verts, faces[1:], w2cs, projs) == 0
    flipped = np.concatenate([faces[:1, ::-1], faces[1:]])
    assert detect_cull_sign(verts, flipped, w2cs, projs) == 0

    # culled audit sees roughly half the pairs
    clip = project_verts(jnp.asarray(verts), jnp.asarray(w2cs),
                         jnp.asarray(projs))
    # pair reduction is chunk-granular (a chunk drops only when ALL its
    # 128 faces cull): ~13% at this toy density, 33% at prod geometry
    # (35,400 -> 23,791 pairs, measured round 5)
    live0, _ = audit_deferred_rows(clip, faces, res)
    live1, _ = audit_deferred_rows(clip, faces, res, cull=sign)
    assert live1.sum() < 0.95 * live0.sum()

    topo_aa = AATopology.build(faces, verts.shape[0])
    rng = np.random.default_rng(3)
    attr0 = jnp.asarray(rng.standard_normal((verts.shape[0], 4)),
                        jnp.float32)
    gimg = jnp.asarray(rng.standard_normal((2,) + res + (4,)), jnp.float32)

    def run(cull):
        def loss(v, attr):
            rast, feat, aa_w = render_scene(
                v, faces, jnp.asarray(w2cs), jnp.asarray(projs), attr,
                res, impl="deferred", aa_topology=topo_aa, cull=cull)
            out = apply_antialias(feat, aa_w)
            return (jnp.sum(out * gimg) + jnp.sum(rast[..., 2] ** 2),
                    (rast, feat))

        (l, (rast, feat)), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(jnp.asarray(verts), attr0)
        return l, rast, feat, g

    l0, rast0, feat0, g0 = run(0)
    l1, rast1, feat1, g1 = run(sign)
    np.testing.assert_array_equal(np.asarray(rast0[..., 3]),
                                  np.asarray(rast1[..., 3]))
    assert np.asarray(rast0[..., 3] > 0).any(), "scene must cover pixels"
    np.testing.assert_array_equal(np.asarray(feat0), np.asarray(feat1))
    np.testing.assert_array_equal(float(l0), float(l1))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)

    # the wrong sign is NOT identical (sanity that the flag does something)
    _, rastw, _, _ = run(-sign)
    assert not np.array_equal(np.asarray(rast0[..., 3]),
                              np.asarray(rastw[..., 3]))


def test_camera_grads_false_sums_views_in_kernel():
    """camera_grads=False (the trainers' setting): the backward kernel
    accumulates ONE view-summed rest-space gradient table instead of
    [B, rec, Fpad]. Vertex/attr grads match the per-view formulation to
    reassociation tolerance; the mats cotangent is zero by contract."""
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.raster.deferred import render_pixels_projected

    res = (16, 32)
    verts, faces, w2cs, projs = hand_scene(
        res=res, n_views=2, subdiv=0, fill=0.3)
    topo = DeferredTopology.build(faces, verts.shape[0])
    mats = jnp.einsum("bkl,blm->bkm", jnp.asarray(w2cs),
                      jnp.asarray(projs))
    rng = np.random.default_rng(0)
    attr = jnp.asarray(rng.standard_normal((verts.shape[0], 4)),
                       jnp.float32)
    gimg = jnp.asarray(rng.standard_normal((2,) + res + (4,)), jnp.float32)

    def loss(v, m, a, cg):
        rast, feat, _ = render_pixels_projected(
            v, m, a, topo, res, with_aa=False, interpret=True,
            camera_grads=cg)
        return jnp.sum(feat * gimg) + jnp.sum(rast[..., :3] ** 2) * 0.1

    v0 = jnp.asarray(verts)
    l1, (gv1, gm1, ga1) = jax.value_and_grad(
        lambda v, m, a: loss(v, m, a, True), argnums=(0, 1, 2))(
        v0, mats, attr)
    l2, (gv2, gm2, ga2) = jax.value_and_grad(
        lambda v, m, a: loss(v, m, a, False), argnums=(0, 1, 2))(
        v0, mats, attr)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    scale = float(jnp.abs(gv1).max())
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2),
                               atol=1e-4 * scale, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2),
                               atol=1e-5, rtol=1e-4)
    assert float(jnp.abs(gm1).max()) > 0      # per-view path has mats grads
    assert float(jnp.abs(gm2).max()) == 0.0   # summed path: zero by contract
