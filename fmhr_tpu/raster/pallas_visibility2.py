"""Pallas visibility kernel, v2: per-tile dynamic loop with manual DMA.

Grid is (views, tiles) only; each kernel instance runs a
`jax.lax.fori_loop` over ceil(count/chunk) iterations of its OWN tile's
bin — empty tiles cost one scalar compare, and the v1 kernel's
per-(tile, chunk) grid-step overhead disappears.

The per-tile triangle table stays in HBM (`pltpu.ANY`) and chunks are
double-buffered into small VMEM scratch with explicit async copies:
VMEM-resident blocks capped the bin capacity at ~2k (the pipeliner's
double-buffered [K, 12] block blew the 16 MB scoped VMEM limit at the
capacities production-density meshes need — measured ~6.3k faces/tile for
a subdiv-3 hand at 256²).
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


def _make_kernel(chunk, tile_h, tile_w, tiles_x, height, width, num_tiles,
                 row_len):
    inv_w2 = np.float32(2.0 / width)
    inv_h2 = np.float32(2.0 / height)

    def kernel(count_ref, tri_hbm, out_ref):
        # count_ref [1,1,1,1] SMEM; tri_hbm [B*T*K*16] ANY/HBM flat: 16-float
        # records (12 clip coords, face_id+1 as float, 3 pad) — records
        # keep every DMA slice a multiple of 128 lanes (Mosaic requires
        # lane-aligned HBM slices; a [chunk, 12] slice is not).
        # out_ref [1,1,th,tw] VMEM int32
        b = pl.program_id(0)
        t = pl.program_id(1)
        ty = t // tiles_x
        tx = t % tiles_x
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        pxb = (col + tx * tile_w).astype(jnp.float32) * inv_w2 + (0.5 * inv_w2 - 1.0)
        pyb = (row + ty * tile_h).astype(jnp.float32) * inv_h2 + (0.5 * inv_h2 - 1.0)

        count = count_ref[0, 0, 0, 0]
        n_iter = (count + (chunk - 1)) // chunk

        def body(tri_buf, sems):
            rec = 16

            def dma(slot, ci):
                # flat offset: tile row start + chunk offset (all multiples
                # of chunk*16, itself a multiple of 128 lanes)
                base = (b * num_tiles + t) * row_len + ci * (chunk * rec)
                return pltpu.make_async_copy(
                    tri_hbm.at[pl.ds(base, chunk * rec)],
                    tri_buf.at[pl.ds(slot * (chunk * rec), chunk * rec)],
                    sems.at[slot],
                )

            @pl.when(n_iter > 0)
            def _():
                dma(0, 0).start()

            def loop(ci, carry):
                zbest, ibest = carry
                slot = jax.lax.rem(ci, 2)
                nslot = jax.lax.rem(ci + 1, 2)

                @pl.when(ci + 1 < n_iter)
                def _():
                    dma(nslot, ci + 1).start()

                dma(slot, ci).wait()

                tri_c = tri_buf[pl.ds(slot * (chunk * rec), chunk * rec)]
                for k in range(chunk):
                    o = k * rec
                    face_id = tri_c[o + 12].astype(jnp.int32)
                    x0, y0, z0, w0 = (tri_c[o + 0], tri_c[o + 1],
                                      tri_c[o + 2], tri_c[o + 3])
                    x1, y1, z1, w1 = (tri_c[o + 4], tri_c[o + 5],
                                      tri_c[o + 6], tri_c[o + 7])
                    x2, y2, z2, w2 = (tri_c[o + 8], tri_c[o + 9],
                                      tri_c[o + 10], tri_c[o + 11])
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
                    cov = ((sgn * l0 >= 0.0) & (sgn * l1 >= 0.0)
                           & (sgn * l2 >= 0.0) & ok)
                    inv_d = 1.0 / jnp.where(jnp.abs(d) > AREA_EPS, d, AREA_EPS)
                    zw = (l0 * (z0 * iw0) + l1 * (z1 * iw1)
                          + l2 * (z2 * iw2)) * inv_d
                    zw = jnp.where(cov, zw, _BIG)
                    better = zw < zbest
                    zbest = jnp.where(better, zw, zbest)
                    ibest = jnp.where(better, face_id, ibest)
                return zbest, ibest

            init = (
                jnp.full((tile_h, tile_w), _BIG, jnp.float32),
                jnp.zeros((tile_h, tile_w), jnp.int32),
            )
            zbest, ibest = jax.lax.fori_loop(0, n_iter, loop, init)
            out_ref[0, 0] = ibest

        pl.run_scoped(
            body,
            tri_buf=pltpu.VMEM((2 * chunk * 16,), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

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
    chunk: int = 64,
    max_span: int = 16,
    global_capacity: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Per-pixel ids via the dynamic-loop DMA kernel. Contract of
    rasterize_ids_*. chunk must be a multiple of 64 (the 16-float records
    make each DMA chunk*16 elements; 1-D HBM slices must align to the
    1024-element tile)."""
    assert chunk % 64 == 0, "chunk must be a multiple of 64"
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
    # Global (oversized) faces first: the active entries form a prefix of
    # length G + count_t; the kernel loops only over that prefix.
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
    binned_ids = jnp.where(work >= 0, work + 1, 0).astype(jnp.float32)
    # 16-float records: [12 coords, id, 0, 0, 0]; DMA slices stay
    # 128-lane aligned (chunk*16 with chunk % 8 == 0).
    records = jnp.concatenate(
        [binned_tri, binned_ids[..., None],
         jnp.zeros((B, T, K_pad, 3), binned_tri.dtype)], axis=-1,
    ).reshape(B * T * K_pad * 16)

    kernel = _make_kernel(chunk, tile_h, tile_w, tiles_x, height, width,
                          T, K_pad * 16)
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_h, tile_w), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, tile_h, tile_w), jnp.int32),
        interpret=interpret,
    )(
        active_counts.reshape(B, T, 1, 1),
        records,
    )

    img = out.reshape(B, tiles_y, tiles_x, tile_h, tile_w)
    img = img.transpose(0, 1, 3, 2, 4).reshape(B, Hp, Wp)
    return img[:, :height, :width]
