"""Public rasterization API: rasterize / interpolate.

`rasterize` = visibility (non-differentiable ids, see visibility.py) +
analytic per-pixel barycentrics (differentiable). Gradients w.r.t. clip
vertices flow through the barycentric recomputation exactly as in
nvdiffrast's rasterize backward; silhouette gradients come from
`antialias` (antialias.py). Together these replicate the gradient paths
the reference relies on (`mesh_sfs_optim.py:142-147, 267-287`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import (
    pixel_ndc,
    screen_xy,
    tri_screen_barycentrics,
    perspective_correct,
    tri_depth_zw,
)
from .visibility import rasterize_ids_naive, rasterize_ids_binned


def default_capacity(num_faces: int) -> int:
    """Per-tile bin capacity heuristic: cover the whole mesh for small
    meshes (no drops possible), cap the pre-gather for large ones."""
    return int(min(max(128, num_faces), 2048))


def rasterize_ids(clip, faces, resolution, impl="auto", **kw):
    """Per-pixel triangle ids, [B, H, W] int32, 0 = background.

    resolution: (H, W) — nvdiffrast order (`mesh_sfs_optim.py:54`).
    impl: 'naive' | 'binned' | 'pallas' | 'auto'.
    """
    h, w = resolution
    faces = jnp.asarray(faces, jnp.int32)
    if impl == "auto":
        impl = "binned" if faces.shape[0] > 2048 or h * w > 128 * 128 else "naive"
    if impl == "naive":
        return rasterize_ids_naive(clip, faces, h, w)
    kw.setdefault("capacity", default_capacity(int(faces.shape[0])))
    if impl == "pallas":
        from .pallas_visibility import rasterize_ids_pallas

        return rasterize_ids_pallas(clip, faces, h, w, **kw)
    return rasterize_ids_binned(clip, faces, h, w, **kw)


def barycentrics_from_ids(ids, clip, faces, resolution):
    """Differentiable phase 2: ids + clip verts -> nvdiffrast-style rast.

    ids: [B, H, W] int32 (treated as constant); clip: [B, V, 4].
    Returns rast [B, H, W, 4] = (u, v, z/w, id) with id cast to float,
    zeros on background — matching nvdiffrast's output layout.
    """
    h, w = resolution
    ids = jax.lax.stop_gradient(ids)
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    # Face gather with a dummy row for background (id 0 -> face F).
    face_idx = jnp.where(ids > 0, ids - 1, F)
    faces_ext = jnp.concatenate(
        [faces, jnp.zeros((1, 3), jnp.int32)], axis=0
    )
    pix_faces = faces_ext[face_idx]  # [B, H, W, 3]
    tri = jax.vmap(lambda c, i: c[i])(clip, pix_faces.reshape(clip.shape[0], -1))
    tri = tri.reshape(ids.shape + (3, 4))  # [B, H, W, 3, 4]

    px, py = pixel_ndc(h, w, clip.dtype)
    sx, sy, ww = screen_xy(tri)
    lam, _d = tri_screen_barycentrics(
        sx, sy, px[None, None, :], py[None, :, None]
    )
    uvw = perspective_correct(lam, ww)  # [B, H, W, 3]
    zw = tri_depth_zw(lam, tri)

    mask = (ids > 0)[..., None]
    rast = jnp.concatenate(
        [uvw[..., 0:1], uvw[..., 1:2], zw[..., None], ids[..., None].astype(clip.dtype)],
        axis=-1,
    )
    return jnp.where(mask, rast, 0.0)


def rasterize(clip, faces, resolution, impl="auto", **kw):
    """nvdiffrast-equivalent rasterize: [B, V, 4] -> rast [B, H, W, 4].

    Differentiable w.r.t. `clip` through the barycentrics (interior
    gradients); combine with `antialias` for silhouette gradients.
    """
    ids = rasterize_ids(clip, faces, resolution, impl=impl, **kw)
    return barycentrics_from_ids(ids, clip, faces, resolution)


def interpolate(attr, rast, faces):
    """Barycentric attribute interpolation.

    attr: [B, V, C] (or [V, C] broadcast); rast: [B, H, W, 4];
    faces: [F, 3]. Returns [B, H, W, C], zeros on background.
    Parity: `dr.interpolate(attr, rast_out, faces)` — gradients reach both
    the attributes and (via rast u, v) the clip-space vertices.
    """
    if attr.ndim == 2:
        attr = attr[None]
    faces = jnp.asarray(faces, jnp.int32)
    B, H, W, _ = rast.shape
    ids = rast[..., 3].astype(jnp.int32)
    F = faces.shape[0]
    face_idx = jnp.where(ids > 0, ids - 1, F)
    faces_ext = jnp.concatenate([faces, jnp.zeros((1, 3), jnp.int32)], axis=0)
    pix_faces = faces_ext[face_idx]  # [B, H, W, 3]

    if attr.shape[0] == 1 and B > 1:
        attr = jnp.broadcast_to(attr, (B,) + attr.shape[1:])
    flat = pix_faces.reshape(B, -1)  # [B, H*W*3]
    vals = jax.vmap(lambda a, i: a[i])(attr, flat)  # [B, H*W*3, C]
    vals = vals.reshape(B, H, W, 3, -1)

    u = rast[..., 0:1]
    v = rast[..., 1:2]
    w0 = u
    w1 = v
    w2 = 1.0 - u - v
    out = w0 * vals[..., 0, :] + w1 * vals[..., 1, :] + w2 * vals[..., 2, :]
    mask = (ids > 0)[..., None]
    return jnp.where(mask, out, 0.0)
