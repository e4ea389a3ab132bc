"""Pallas visibility kernel, v2: per-tile dynamic loop.

Grid is (views, tiles) only; each kernel instance runs a
`jax.lax.fori_loop` over ceil(count/chunk) iterations of its OWN tile's
bin — empty tiles cost one scalar compare instead of `n_chunks` grid
steps, and the ~0.3 µs/grid-step driver overhead of the v1 kernel's
(views, tiles, chunks) grid disappears. Triangle chunks are loaded from
the VMEM-resident tile table with dynamic slices and reduced with the
same where-min as v1.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .visibility import _bin_one_view
from .geometry import W_EPS, AREA_EPS

_BIG = np.float32(3.0e38)


def _make_kernel(chunk, tile_h, tile_w, tiles_x, height, width, capacity):
    inv_w2 = np.float32(2.0 / width)
    inv_h2 = np.float32(2.0 / height)
    n_chunk_max = capacity // chunk

    def kernel(count_ref, tri_ref, ids_ref, out_ref):
        # count_ref [1,1,1,1] SMEM; tri_ref [1,1,K,12] VMEM;
        # ids_ref [1,1,K,1] VMEM (int32); out_ref [1,1,th,tw] VMEM
        t = pl.program_id(1)
        ty = t // tiles_x
        tx = t % tiles_x
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        pxb = (col + tx * tile_w).astype(jnp.float32) * inv_w2 + (0.5 * inv_w2 - 1.0)
        pyb = (row + ty * tile_h).astype(jnp.float32) * inv_h2 + (0.5 * inv_h2 - 1.0)

        count = count_ref[0, 0, 0, 0]
        n_iter = (count + (chunk - 1)) // chunk

        def body(ci, carry):
            zbest, ibest = carry
            base = pl.multiple_of(ci * chunk, chunk)
            tri_c = tri_ref[0, 0, pl.ds(base, chunk), :]   # [chunk, 12]
            ids_c = ids_ref[0, 0, pl.ds(base, chunk), 0]   # [chunk]
            for k in range(chunk):
                face_id = ids_c[k]
                x0, y0, z0, w0 = tri_c[k, 0], tri_c[k, 1], tri_c[k, 2], tri_c[k, 3]
                x1, y1, z1, w1 = tri_c[k, 4], tri_c[k, 5], tri_c[k, 6], tri_c[k, 7]
                x2, y2, z2, w2 = tri_c[k, 8], tri_c[k, 9], tri_c[k, 10], tri_c[k, 11]
                iw0 = 1.0 / jnp.where(jnp.abs(w0) > W_EPS, w0, W_EPS)
                iw1 = 1.0 / jnp.where(jnp.abs(w1) > W_EPS, w1, W_EPS)
                iw2 = 1.0 / jnp.where(jnp.abs(w2) > W_EPS, w2, W_EPS)
                sx0, sy0 = x0 * iw0, y0 * iw0
                sx1, sy1 = x1 * iw1, y1 * iw1
                sx2, sy2 = x2 * iw2, y2 * iw2
                d = (sx1 - sx0) * (sy2 - sy0) - (sx2 - sx0) * (sy1 - sy0)
                l0 = (sx1 - pxb) * (sy2 - pyb) - (sx2 - pxb) * (sy1 - pyb)
                l1 = (sx2 - pxb) * (sy0 - pyb) - (sx0 - pxb) * (sy2 - pyb)
                l2 = (sx0 - pxb) * (sy1 - pyb) - (sx1 - pxb) * (sy0 - pyb)
                sgn = jnp.where(d >= 0.0, 1.0, -1.0).astype(jnp.float32)
                ok = (
                    (face_id > 0)
                    & (jnp.abs(d) > AREA_EPS)
                    & (jnp.minimum(jnp.minimum(w0, w1), w2) > W_EPS)
                )
                cov = (sgn * l0 >= 0.0) & (sgn * l1 >= 0.0) & (sgn * l2 >= 0.0) & ok
                inv_d = 1.0 / jnp.where(jnp.abs(d) > AREA_EPS, d, AREA_EPS)
                zw = (l0 * (z0 * iw0) + l1 * (z1 * iw1) + l2 * (z2 * iw2)) * inv_d
                zw = jnp.where(cov, zw, _BIG)
                better = zw < zbest
                zbest = jnp.where(better, zw, zbest)
                ibest = jnp.where(better, face_id, ibest)
            return zbest, ibest

        init = (
            jnp.full((tile_h, tile_w), _BIG, jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.int32),
        )
        zbest, ibest = jax.lax.fori_loop(0, n_iter, body, init)
        out_ref[0, 0] = ibest

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile_h", "tile_w", "capacity", "chunk",
        "max_span", "global_capacity", "interpret",
    ),
)
def rasterize_ids_pallas_v2(
    clip: jax.Array,
    faces,
    height: int,
    width: int,
    *,
    tile_h: int = 8,
    tile_w: int = 128,
    capacity: int = 1024,
    chunk: int = 8,
    max_span: int = 16,
    global_capacity: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Per-pixel ids via the dynamic-loop kernel. Contract of
    rasterize_ids_*."""
    faces = jnp.asarray(faces, jnp.int32)
    B = clip.shape[0]
    F = faces.shape[0]
    tiles_y = math.ceil(height / tile_h)
    tiles_x = math.ceil(width / tile_w)
    T = tiles_y * tiles_x
    Hp, Wp = tiles_y * tile_h, tiles_x * tile_w

    tri = clip[:, faces]
    bins, counts, big = jax.vmap(
        lambda t: _bin_one_view(
            t, tile_h=tile_h, tile_w=tile_w, tiles_y=tiles_y, tiles_x=tiles_x,
            height=height, width=width, max_span=max_span,
            capacity=capacity, global_capacity=global_capacity,
        )
    )(tri)

    G = big.shape[1]
    work = jnp.concatenate(
        [jnp.broadcast_to(big[:, None, :], (B, T, G)), bins], axis=2
    )
    K_total = work.shape[2]
    pad = (-K_total) % chunk
    work = jnp.pad(work, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    K_pad = work.shape[2]
    active_counts = (counts + G).astype(jnp.int32)

    sent = jnp.concatenate(
        [jnp.zeros((B, 1, 3, 3), tri.dtype), jnp.full((B, 1, 3, 1), -1.0, tri.dtype)],
        axis=-1,
    )
    tri_ext = jnp.concatenate([tri, sent], axis=1).reshape(B, F + 1, 12)
    gather_idx = jnp.where(work >= 0, work, F)
    binned_tri = jax.vmap(lambda t, i: t[i])(tri_ext, gather_idx)
    binned_ids = jnp.where(work >= 0, work + 1, 0).astype(jnp.int32)

    kernel = _make_kernel(chunk, tile_h, tile_w, tiles_x, height, width, K_pad)
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K_pad, 12), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K_pad, 1), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_h, tile_w), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, tile_h, tile_w), jnp.int32),
        interpret=interpret,
    )(
        active_counts.reshape(B, T, 1, 1),
        binned_tri,
        binned_ids.reshape(B, T, K_pad, 1),
    )

    img = out.reshape(B, tiles_y, tiles_x, tile_h, tile_w)
    img = img.transpose(0, 1, 3, 2, 4).reshape(B, Hp, Wp)
    return img[:, :height, :width]
