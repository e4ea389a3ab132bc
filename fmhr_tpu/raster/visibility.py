"""Visibility phase: per-pixel covering triangle ids (argmin depth).

Two interchangeable implementations with identical outputs:

- `rasterize_ids_naive`: chunked scan over ALL faces per pixel. O(H·W·F);
  the oracle for tests and fine for small meshes.
- `rasterize_ids_binned`: GPU-style tile binning re-expressed for XLA's
  static-shape world: per-face tile ranges -> (tile, face) pair expansion
  with a static per-face slot cap -> stable sort by tile -> per-tile
  fixed-capacity bins -> chunked depth-test scan over each tile's bin.
  Oversized triangles (spanning more tiles than the slot cap) go to a
  small global list that every tile also tests, so correctness never
  depends on the cap.

Ids are 1-based (0 = background), matching nvdiffrast's
`rast_out[..., 3]` convention the reference tests against
(`mesh_sfs_optim.py:150`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .geometry import (
    pixel_ndc,
    screen_xy,
    tri_screen_barycentrics,
    perspective_correct,
    tri_depth_zw,
    coverage,
    W_EPS,
    AREA_EPS,
)

_BIG = jnp.float32(jnp.inf)


def _chunk_best(tri_chunk, ids_chunk, px, py):
    """Best (z, id) per pixel among one chunk of triangles.

    tri_chunk: [B, C, 3, 4]; ids_chunk: [C] (1-based, 0 entries = padding);
    px: [W], py: [H]. Returns (z [B, H, W], id [B, H, W]).
    """
    sx, sy, w = screen_xy(tri_chunk)  # [B, C, 3]
    pxb = px[None, None, None, :]  # [1,1,1,W]
    pyb = py[None, None, :, None]  # [1,1,H,1]
    lam, d = tri_screen_barycentrics(
        sx[:, :, None, None, :], sy[:, :, None, None, :], pxb, pyb
    )  # lam [B, C, H, W, 3]
    cov = coverage(lam, d, w[:, :, None, None, :])
    cov = cov & (ids_chunk[None, :, None, None] > 0)
    zw = tri_depth_zw(lam, tri_chunk[:, :, None, None, :, :])  # [B, C, H, W]
    zw = jnp.where(cov, zw, _BIG)
    best = jnp.argmin(zw, axis=1)  # [B, H, W] first-minimum = lowest face id
    zbest = jnp.take_along_axis(zw, best[:, None], axis=1)[:, 0]
    idbest = jnp.where(zbest < _BIG, ids_chunk[best], 0)
    return zbest, idbest


def rasterize_ids_naive(
    clip: jax.Array, faces, height: int, width: int, chunk: int = 32
) -> jax.Array:
    """[B, V, 4] clip verts -> [B, H, W] int32 ids (0 = background)."""
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    tri = clip[:, faces]  # [B, F, 3, 4]
    n_chunks = max(1, math.ceil(F / chunk))
    Fpad = n_chunks * chunk
    tri = jnp.pad(tri, ((0, 0), (0, Fpad - F), (0, 0), (0, 0)))
    ids = jnp.pad(jnp.arange(1, F + 1, dtype=jnp.int32), (0, Fpad - F))
    px, py = pixel_ndc(height, width)

    tri_s = tri.reshape(tri.shape[0], n_chunks, chunk, 3, 4).swapaxes(0, 1)
    ids_s = ids.reshape(n_chunks, chunk)

    def body(carry, xs):
        zb, ib = carry
        tri_c, ids_c = xs
        z, i = _chunk_best(tri_c, ids_c, px, py)
        better = z < zb
        return (jnp.where(better, z, zb), jnp.where(better, i, ib)), None

    B = clip.shape[0]
    init = (
        jnp.full((B, height, width), _BIG),
        jnp.zeros((B, height, width), jnp.int32),
    )
    (zb, ib), _ = jax.lax.scan(body, init, (tri_s, ids_s))
    return ib


# --------------------------------------------------------------------------
# Tile-binned implementation
# --------------------------------------------------------------------------

def _face_tile_ranges(tri, tile_h, tile_w, tiles_y, tiles_x, height, width):
    """Per-face tile bbox. tri: [F, 3, 4] for ONE view.

    Returns (tx0, ty0, span_x, span_y, valid) each [F] int32/bool.
    """
    sx, sy, w = screen_xy(tri)  # [F, 3]
    in_front = jnp.all(w > W_EPS, axis=-1)
    # NDC -> pixel coords
    x_pix = (sx + 1.0) * (width * 0.5)
    y_pix = (sy + 1.0) * (height * 0.5)
    xmin = jnp.clip(jnp.floor(jnp.min(x_pix, 1)), 0, width - 1)
    xmax = jnp.clip(jnp.ceil(jnp.max(x_pix, 1)), 0, width - 1)
    ymin = jnp.clip(jnp.floor(jnp.min(y_pix, 1)), 0, height - 1)
    ymax = jnp.clip(jnp.ceil(jnp.max(y_pix, 1)), 0, height - 1)
    offscreen = (
        (jnp.max(x_pix, 1) < 0) | (jnp.min(x_pix, 1) >= width)
        | (jnp.max(y_pix, 1) < 0) | (jnp.min(y_pix, 1) >= height)
    )
    valid = in_front & ~offscreen
    tx0 = (xmin // tile_w).astype(jnp.int32)
    tx1 = (xmax // tile_w).astype(jnp.int32)
    ty0 = (ymin // tile_h).astype(jnp.int32)
    ty1 = (ymax // tile_h).astype(jnp.int32)
    span_x = jnp.where(valid, tx1 - tx0 + 1, 0)
    span_y = jnp.where(valid, ty1 - ty0 + 1, 0)
    return tx0, ty0, span_x, span_y, valid


def _bin_one_view(tri, *, tile_h, tile_w, tiles_y, tiles_x, height, width,
                  max_span, capacity, global_capacity):
    """Build per-tile face bins for one view.

    Returns (bins [T, K] int32 face ids (-1 pad), counts [T],
             global_faces [G] int32 (-1 pad)).
    """
    F = tri.shape[0]
    T = tiles_y * tiles_x
    tx0, ty0, span_x, span_y, valid = _face_tile_ranges(
        tri, tile_h, tile_w, tiles_y, tiles_x, height, width
    )
    n_tiles = span_x * span_y
    small = valid & (n_tiles <= max_span)
    big = valid & (n_tiles > max_span)

    # (face, slot) -> tile key; slot grid is row-major within the bbox.
    slots = jnp.arange(max_span, dtype=jnp.int32)  # [S]
    dx = slots[None, :] % jnp.maximum(span_x, 1)[:, None]
    dy = slots[None, :] // jnp.maximum(span_x, 1)[:, None]
    live = small[:, None] & (slots[None, :] < n_tiles[:, None])
    tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
    tile = jnp.where(live, tile, T)  # sentinel tile T sorts last
    face = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None], tile.shape)

    keys = tile.reshape(-1)
    vals = face.reshape(-1)
    keys, vals = jax.lax.sort_key_val(keys, vals, is_stable=True)

    starts = jnp.searchsorted(keys, jnp.arange(T, dtype=jnp.int32), side="left")
    ends = jnp.searchsorted(keys, jnp.arange(T, dtype=jnp.int32), side="right")
    counts = (ends - starts).astype(jnp.int32)

    k = jnp.arange(capacity, dtype=jnp.int32)
    gather_idx = jnp.minimum(starts[:, None] + k[None, :], keys.shape[0] - 1)
    bins = vals[gather_idx]
    bins = jnp.where(k[None, :] < jnp.minimum(counts, capacity)[:, None], bins, -1)

    # Oversized faces -> global list (tested by every tile).
    big_idx = jnp.nonzero(big, size=global_capacity, fill_value=-1)[0].astype(jnp.int32)
    return bins, jnp.minimum(counts, capacity), big_idx


def _gather_tri(tri, face_ids):
    """tri [F+1, 3, 4] (last row = sentinel), ids [...] with -1 padding."""
    idx = jnp.where(face_ids >= 0, face_ids, tri.shape[0] - 1)
    return tri[idx]


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "tile_h", "tile_w", "capacity", "chunk",
        "max_span", "global_capacity",
    ),
)
def rasterize_ids_binned(
    clip: jax.Array,
    faces,
    height: int,
    width: int,
    *,
    tile_h: int = 8,
    tile_w: int = 128,
    capacity: int = 512,
    chunk: int = 8,
    max_span: int = 16,
    global_capacity: int = 64,
) -> jax.Array:
    """Tile-binned visibility. Same contract as `rasterize_ids_naive`.

    capacity: max faces considered per tile (excess silently dropped —
    size it to the mesh; HAM meshes after x3 subdivision have tiny
    triangles, tens per tile).
    """
    faces = jnp.asarray(faces, jnp.int32)
    B = clip.shape[0]
    F = faces.shape[0]
    tiles_y = math.ceil(height / tile_h)
    tiles_x = math.ceil(width / tile_w)
    T = tiles_y * tiles_x
    Hp, Wp = tiles_y * tile_h, tiles_x * tile_w

    tri = clip[:, faces]  # [B, F, 3, 4]
    bins, counts, big = jax.vmap(
        lambda t: _bin_one_view(
            t, tile_h=tile_h, tile_w=tile_w, tiles_y=tiles_y, tiles_x=tiles_x,
            height=height, width=width, max_span=max_span,
            capacity=capacity, global_capacity=global_capacity,
        )
    )(tri)  # bins [B, T, K], counts [B, T], big [B, G]

    # Sentinel triangle row for -1 gathers: w <= 0 -> never covers.
    sent = jnp.concatenate(
        [jnp.zeros((B, 1, 3, 3), tri.dtype), jnp.full((B, 1, 3, 1), -1.0, tri.dtype)],
        axis=-1,
    )
    tri_ext = jnp.concatenate([tri, sent], axis=1)  # [B, F+1, 3, 4]

    # Tile-local pixel NDC coords: [T, tile_h] rows and [T, tile_w] cols.
    # NDC scale uses the TRUE image size; padded pixels fall outside [-1, 1]
    # and are cropped at the end.
    px_full = (jnp.arange(Wp, dtype=clip.dtype) + 0.5) * (2.0 / width) - 1.0
    py_full = (jnp.arange(Hp, dtype=clip.dtype) + 0.5) * (2.0 / height) - 1.0
    t_idx = jnp.arange(T, dtype=jnp.int32)
    ty, tx = t_idx // tiles_x, t_idx % tiles_x
    rows = ty[:, None] * tile_h + jnp.arange(tile_h)[None, :]  # [T, th]
    cols = tx[:, None] * tile_w + jnp.arange(tile_w)[None, :]  # [T, tw]
    py_t = py_full[rows]  # [T, th]
    px_t = px_full[cols]  # [T, tw]

    # Append the global (oversized-face) list to every tile's work.
    G = big.shape[1]
    work = jnp.concatenate(
        [bins, jnp.broadcast_to(big[:, None, :], (B, T, G))], axis=2
    )  # [B, T, K+G]
    K_total = work.shape[2]
    n_chunks = math.ceil(K_total / chunk)
    pad = n_chunks * chunk - K_total
    work = jnp.pad(work, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    work_s = work.reshape(B, T, n_chunks, chunk).transpose(2, 0, 1, 3)  # [n, B, T, c]

    def body(carry, w_chunk):
        # Unrolled per-triangle where-min: every k adds ~20 elementwise ops
        # on the [B, T, th, tw] block and XLA fuses the whole chunk into a
        # single kernel — no [B, T, chunk, th, tw] HBM intermediates (the
        # earlier stack+argmin formulation measured ~7 s/frame at 512² on
        # TPU v5e; this form is bandwidth-bound on the carry only).
        zb, ib = carry  # [B, T, th, tw]
        tri_c = _gather_tri_batched(tri_ext, w_chunk)  # [B, T, c, 3, 4]
        pxb = px_t[None, :, None, :]  # [1, T, 1, tw]
        pyb = py_t[None, :, :, None]  # [1, T, th, 1]
        for k in range(chunk):
            tri_k = tri_c[:, :, k]  # [B, T, 3, 4]
            sx, sy, ww = screen_xy(tri_k)  # [B, T, 3]
            e = lambda a: a[:, :, None, None]
            sx0, sx1, sx2 = e(sx[..., 0]), e(sx[..., 1]), e(sx[..., 2])
            sy0, sy1, sy2 = e(sy[..., 0]), e(sy[..., 1]), e(sy[..., 2])
            d = (sx1 - sx0) * (sy2 - sy0) - (sx2 - sx0) * (sy1 - sy0)
            l0 = (sx1 - pxb) * (sy2 - pyb) - (sx2 - pxb) * (sy1 - pyb)
            l1 = (sx2 - pxb) * (sy0 - pyb) - (sx0 - pxb) * (sy2 - pyb)
            l2 = (sx0 - pxb) * (sy1 - pyb) - (sx1 - pxb) * (sy0 - pyb)
            sgn = jnp.where(d >= 0, 1.0, -1.0)
            ok = (
                (w_chunk[:, :, k] >= 0)
                & (jnp.min(ww, axis=-1) > W_EPS)
            )[:, :, None, None] & (jnp.abs(d) > AREA_EPS)
            cov = (sgn * l0 >= 0) & (sgn * l1 >= 0) & (sgn * l2 >= 0) & ok
            iw = 1.0 / jnp.where(jnp.abs(ww) > W_EPS, ww, W_EPS)
            zws = tri_k[..., 2] * iw  # [B, T, 3]
            inv_d = 1.0 / jnp.where(jnp.abs(d) > AREA_EPS, d, AREA_EPS)
            zw = (l0 * e(zws[..., 0]) + l1 * e(zws[..., 1])
                  + l2 * e(zws[..., 2])) * inv_d
            zw = jnp.where(cov, zw, _BIG)
            better = zw < zb
            zb = jnp.where(better, zw, zb)
            ib = jnp.where(better, (w_chunk[:, :, k] + 1)[:, :, None, None], ib)
        return (zb, ib), None

    init = (
        jnp.full((B, T, tile_h, tile_w), _BIG),
        jnp.zeros((B, T, tile_h, tile_w), jnp.int32),
    )
    (zb, ib), _ = jax.lax.scan(body, init, work_s)

    # [B, T, th, tw] -> [B, Hp, Wp] -> crop
    img = ib.reshape(B, tiles_y, tiles_x, tile_h, tile_w)
    img = img.transpose(0, 1, 3, 2, 4).reshape(B, Hp, Wp)
    return img[:, :height, :width]


def _gather_tri_batched(tri_ext, face_ids):
    """tri_ext [B, F+1, 3, 4]; face_ids [B, ...] -> [B, ..., 3, 4]."""
    idx = jnp.where(face_ids >= 0, face_ids, tri_ext.shape[1] - 1)
    return jax.vmap(lambda t, i: t[i])(tri_ext, idx)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "max_span",
                     "global_capacity"),
)
def _audit_bin_counts_jit(clip, faces, height, width, tile_h, tile_w,
                          max_span, global_capacity):
    tiles_y = math.ceil(height / tile_h)
    tiles_x = math.ceil(width / tile_w)
    tri = clip[:, faces]
    S = max_span
    F = faces.shape[0]
    T = tiles_y * tiles_x

    def one(t):
        tx0, ty0, span_x, span_y, valid = _face_tile_ranges(
            t, tile_h, tile_w, tiles_y, tiles_x, height, width)
        n_tiles = span_x * span_y
        small = valid & (n_tiles <= S)
        slots = jnp.arange(S, dtype=jnp.int32)
        dx = slots[None, :] % jnp.maximum(span_x, 1)[:, None]
        dy = slots[None, :] // jnp.maximum(span_x, 1)[:, None]
        live = small[:, None] & (slots[None, :] < n_tiles[:, None])
        tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        tile = jnp.where(live, tile, T)
        counts = jnp.zeros((T + 1,), jnp.int32).at[tile.reshape(-1)].add(1)
        return counts[:T].max()

    return jax.vmap(one)(tri)


def audit_bin_counts(clip, faces, height, width, tile_h=8, tile_w=128,
                     max_span=16, global_capacity=64):
    """Capacity audit: per-view max per-tile face count (jitted).

    Run once per scene setup to size `capacity` (silent drops otherwise —
    see api.default_capacity). Returns [B] max counts.
    """
    import numpy as _np

    faces = jnp.asarray(faces, jnp.int32)
    out = _audit_bin_counts_jit(clip, faces, height, width, tile_h, tile_w,
                                max_span, global_capacity)
    return [int(x) for x in _np.asarray(out)]
