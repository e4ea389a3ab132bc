"""Pallas visibility kernel vs. the oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from fmhr_tpu.raster.visibility import rasterize_ids_naive
from fmhr_tpu.raster.pallas_visibility import rasterize_ids_pallas
from fmhr_tpu.data.synthetic import hand_scene
from fmhr_tpu.optim.ham import project_verts


def test_pallas_matches_naive_hand():
    verts, faces, w2cs, projs = hand_scene(res=96, n_views=2)
    clip = project_verts(jnp.asarray(verts), jnp.asarray(w2cs), jnp.asarray(projs))
    a = np.asarray(rasterize_ids_naive(clip, faces, 96, 96))
    b = np.asarray(
        rasterize_ids_pallas(
            clip, faces, 96, 96, tile_h=8, tile_w=32, capacity=512,
            chunk=8, interpret=True,
        )
    )
    np.testing.assert_array_equal(a, b)


def test_pallas_random_soup(rng):
    V, F = 40, 30
    verts2d = rng.uniform(-0.9, 0.9, size=(V, 2)).astype(np.float32)
    z = rng.uniform(1.0, 3.0, size=V).astype(np.float32)
    clip = np.stack(
        [verts2d[:, 0] * z, verts2d[:, 1] * z, np.full(V, -0.1, np.float32), z], 1
    )[None]
    faces = jnp.asarray(rng.integers(0, V, size=(F, 3)), jnp.int32)
    a = np.asarray(rasterize_ids_naive(jnp.asarray(clip), faces, 64, 64))
    b = np.asarray(
        rasterize_ids_pallas(
            jnp.asarray(clip), faces, 64, 64, tile_h=8, tile_w=16,
            capacity=64, chunk=8, max_span=32, interpret=True,
        )
    )
    # depth ties between overlapping random faces may resolve differently
    assert (a != b).mean() < 5e-3


def test_pallas_v2_matches_naive():
    from fmhr_tpu.raster.pallas_visibility2 import rasterize_ids_pallas_v2

    verts, faces, w2cs, projs = hand_scene(res=96, n_views=2)
    clip = project_verts(jnp.asarray(verts), jnp.asarray(w2cs), jnp.asarray(projs))
    a = np.asarray(rasterize_ids_naive(clip, faces, 96, 96))
    b = np.asarray(
        rasterize_ids_pallas_v2(
            clip, faces, 96, 96, tile_h=8, tile_w=32, capacity=512,
            chunk=64, interpret=True,
        )
    )
    np.testing.assert_array_equal(a, b)
