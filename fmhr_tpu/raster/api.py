"""Public rasterization API: rasterize / interpolate.

`rasterize` = visibility (non-differentiable ids, see visibility.py) +
analytic per-pixel barycentrics (differentiable). Gradients w.r.t. clip
vertices flow through the barycentric recomputation exactly as in
nvdiffrast's rasterize backward; silhouette gradients come from
`antialias` (antialias.py). Together these replicate the gradient paths
the reference relies on (`mesh_sfs_optim.py:142-147, 267-287`).

Performance note (TPU): gathers indexed by [B, H, W] arrays cost ~10 ms
each at 512²x4 on v5e, so the design minimizes GATHER COUNT: one fused
[B, H, W, 3, 4] triangle gather shared by barycentrics AND antialias via
`raster_context`, immediately unpacked into [B, H, W] per-component
arrays so the elementwise math runs lane-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import pixel_ndc, W_EPS, AREA_EPS
from .visibility import rasterize_ids_naive, rasterize_ids_binned


def default_capacity(num_faces: int) -> int:
    """Per-tile bin capacity heuristic: cover the whole mesh for small
    meshes (no drops possible), cap the scan length for large ones.

    Dense scenes can exceed any fixed cap (measured ~1070 faces in one
    8x128 tile for a subdiv-2 hand at 512² — the thumb/palm overlap of
    the hand-shaped synthetic template); oversized-SPAN faces stay
    correct via the global list, but crowded tiles drop excess faces —
    size `capacity` to the scene when in doubt (counts are cheap to
    audit via visibility._bin_one_view)."""
    return int(min(max(128, num_faces), 1536))


def rasterize_ids(clip, faces, resolution, impl="auto", **kw):
    """Per-pixel triangle ids, [B, H, W] int32, 0 = background.

    resolution: (H, W) — nvdiffrast order (`mesh_sfs_optim.py:54`).
    impl: 'naive' | 'binned' | 'pallas' | 'auto'.
    """
    h, w = resolution
    # Visibility is exactly non-differentiable (piecewise-constant ids);
    # cutting the tangent at the INPUT keeps grad/jvp tracing out of the
    # Mosaic kernel entirely (pallas_call has no JVP path).
    clip = jax.lax.stop_gradient(clip)
    faces = jnp.asarray(faces, jnp.int32)
    if impl == "auto":
        if faces.shape[0] <= 2048 and h * w <= 128 * 128:
            impl = "naive"
        elif jax.default_backend() == "cpu":
            impl = "binned"
        else:
            # TPU: the dynamic-loop Mosaic kernel is ~2x the fused scan at
            # production capacities (and Mosaic doesn't target CPU).
            impl = "pallas_v2"
    if impl == "naive":
        return rasterize_ids_naive(clip, faces, h, w)
    kw.setdefault("capacity", default_capacity(int(faces.shape[0])))
    if impl == "pallas":
        from .pallas_visibility import rasterize_ids_pallas

        return rasterize_ids_pallas(clip, faces, h, w, **kw)
    if impl == "pallas_v2":
        from .pallas_visibility2 import rasterize_ids_pallas_v2

        kw.setdefault("chunk", 64)
        return rasterize_ids_pallas_v2(clip, faces, h, w, **kw)
    return rasterize_ids_binned(clip, faces, h, w, **kw)


def raster_context(ids, clip, faces):
    """Shared per-pixel triangle data for barycentrics + antialias.

    ONE fused gather of the three corner clip 4-vectors, unpacked into
    [B, H, W] component arrays. Returns a dict:
      ids, mask, pix_faces [B,H,W,3],
      x/y/z/w [k] per corner k, sx/sy (screen), iw (1/w), w_ok.
    """
    faces = jnp.asarray(faces, jnp.int32)
    B = clip.shape[0]
    F = faces.shape[0]
    face_idx = jnp.where(ids > 0, ids - 1, F)
    faces_ext = jnp.concatenate([faces, jnp.zeros((1, 3), jnp.int32)], axis=0)
    pix_faces = faces_ext[face_idx]  # [B, H, W, 3]
    tri = jax.vmap(lambda c, i: c[i])(clip, pix_faces.reshape(B, -1))
    tri = tri.reshape(ids.shape + (3, 4))  # [B, H, W, 3, 4]

    x, y, z, w, sx, sy, iw = [], [], [], [], [], [], []
    for k in range(3):
        xk = tri[..., k, 0]
        yk = tri[..., k, 1]
        zk = tri[..., k, 2]
        wk = tri[..., k, 3]
        iwk = 1.0 / jnp.where(jnp.abs(wk) > W_EPS, wk, W_EPS)
        x.append(xk); y.append(yk); z.append(zk); w.append(wk)
        iw.append(iwk)
        sx.append(xk * iwk)
        sy.append(yk * iwk)
    w_ok = (w[0] > 0) & (w[1] > 0) & (w[2] > 0)
    return {
        "ids": ids, "mask": ids > 0, "face_idx": face_idx,
        "x": x, "y": y, "z": z, "w": w, "iw": iw,
        "sx": sx, "sy": sy, "w_ok": w_ok,
    }


def barycentrics_from_context(ctx, resolution, dtype=jnp.float32):
    """rast [B, H, W, 4] from a `raster_context` (differentiable)."""
    h, w = resolution
    ids = ctx["ids"]
    sx0, sx1, sx2 = ctx["sx"]
    sy0, sy1, sy2 = ctx["sy"]
    iw0, iw1, iw2 = ctx["iw"]
    z0, z1, z2 = ctx["z"]

    px, py = pixel_ndc(h, w, dtype)
    pxb = px[None, None, :]
    pyb = py[None, :, None]

    d = (sx1 - sx0) * (sy2 - sy0) - (sx2 - sx0) * (sy1 - sy0)
    safe_d = jnp.where(jnp.abs(d) > AREA_EPS, d, AREA_EPS)
    l0 = ((sx1 - pxb) * (sy2 - pyb) - (sx2 - pxb) * (sy1 - pyb)) / safe_d
    l1 = ((sx2 - pxb) * (sy0 - pyb) - (sx0 - pxb) * (sy2 - pyb)) / safe_d
    l2 = 1.0 - l0 - l1

    lw0, lw1, lw2 = l0 * iw0, l1 * iw1, l2 * iw2
    denom = lw0 + lw1 + lw2
    denom = jnp.where(jnp.abs(denom) > W_EPS, denom, W_EPS)
    u = lw0 / denom
    v = lw1 / denom
    zw = l0 * (z0 * iw0) + l1 * (z1 * iw1) + l2 * (z2 * iw2)

    mask = ctx["mask"]
    zero = jnp.zeros_like(u)
    return jnp.stack(
        [
            jnp.where(mask, u, zero),
            jnp.where(mask, v, zero),
            jnp.where(mask, zw, zero),
            jnp.where(mask, ids.astype(dtype), zero),
        ],
        axis=-1,
    )


def barycentrics_from_ids(ids, clip, faces, resolution):
    """Differentiable phase 2: ids + clip verts -> nvdiffrast-style rast.

    ids: [B, H, W] int32 (treated as constant); clip: [B, V, 4].
    Returns rast [B, H, W, 4] = (u, v, z/w, id), zeros on background —
    matching nvdiffrast's output layout.
    """
    ids = jax.lax.stop_gradient(ids)
    ctx = raster_context(ids, clip, faces)
    return barycentrics_from_context(ctx, resolution, clip.dtype)


def rasterize(clip, faces, resolution, impl="auto", **kw):
    """nvdiffrast-equivalent rasterize: [B, V, 4] -> rast [B, H, W, 4].

    Differentiable w.r.t. `clip` through the barycentrics (interior
    gradients); combine with `antialias` for silhouette gradients.
    """
    ids = rasterize_ids(clip, faces, resolution, impl=impl, **kw)
    return barycentrics_from_ids(ids, clip, faces, resolution)


def rasterize_with_context(clip, faces, resolution, impl="auto", **kw):
    """rasterize + reusable context: returns (rast, ctx). Pass ctx to
    `antialias_weights(..., context=ctx)` to skip its triangle gather."""
    ids = jax.lax.stop_gradient(
        rasterize_ids(clip, faces, resolution, impl=impl, **kw)
    )
    ctx = raster_context(ids, clip, faces)
    return barycentrics_from_context(ctx, resolution, clip.dtype), ctx


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
    w2 = 1.0 - u - v
    out = u * vals[..., 0, :] + v * vals[..., 1, :] + w2 * vals[..., 2, :]
    mask = (ids > 0)[..., None]
    return jnp.where(mask, out, 0.0)


_DEFERRED_TOPO_CACHE: dict = {}


def _deferred_topology_for(faces, num_vertices: int, face_order=None):
    """Host-side DeferredTopology cache keyed by face-array content
    (+ the optional static face permutation, see `face_order_morton`).

    Returns None when `faces` is a traced value (cannot build host-side).
    """
    import numpy as np

    try:
        f_np = np.asarray(faces, np.int32)
    except Exception:
        return None
    okey = None
    if face_order is not None:
        face_order = np.asarray(face_order, np.int32)
        okey = hash(face_order.tobytes())
    key = (f_np.shape[0], int(num_vertices), hash(f_np.tobytes()), okey)
    topo = _DEFERRED_TOPO_CACHE.get(key)
    if topo is None:
        from .deferred import DeferredTopology

        topo = DeferredTopology.build(f_np, num_vertices, order=face_order)
        _DEFERRED_TOPO_CACHE[key] = topo
    return topo


def render_scene(verts, faces, w2cs, projs, attr, resolution, impl="auto",
                 aa_topology=None, **kw):
    """Scene-level render: rest verts [V, 3] through per-view cameras
    (w2cs/projs [B, 4, 4], transposed row-vector convention as in
    optim.ham.project_verts).

    On the deferred path the projection happens INSIDE the Pallas core
    (render_pixels_projected): the corner gather and the backward vertex
    reduction are then B-independent. XLA paths project first and take
    the clip-space render_pixels route. Same returns as render_pixels.
    """
    layout = kw.get("layout", "image")
    if impl in ("auto", "deferred"):
        on_cpu = jax.default_backend() == "cpu"
        # layout="tiled" exists only on the deferred path; on CPU it runs
        # the kernels in interpret mode (parity tests), on TPU it is the
        # training fast path (no untile/retile transposes).
        if impl == "deferred" or not on_cpu or layout in ("tiled",
                                                           "compact"):
            topo_d = _deferred_topology_for(
                faces, verts.shape[0], face_order=kw.get("face_order"))
            if topo_d is not None:
                from .deferred import render_pixels_projected

                mats = jnp.einsum("bkl,blm->bkm", w2cs, projs)
                kw_wc = ({"winner_cap": int(kw["winner_cap"])}
                         if kw.get("winner_cap") else {})
                return render_pixels_projected(
                    verts, mats, attr, topo_d, resolution,
                    max_span=kw.get("max_span"),
                    global_cap=kw.get("global_cap", 64),
                    rows_budget=kw.get("rows_budget"),
                    tiles_budget=kw.get("tiles_budget"),
                    with_aa=aa_topology is not None,
                    aa_budget=kw.get("aa_budget"),
                    mesh=kw.get("mesh"),
                    views_axis=kw.get("views_axis", "views"),
                    with_counters=kw.get("with_counters", False),
                    layout=layout,
                    cull=kw.get("cull", 0),
                    camera_grads=kw.get("camera_grads", True),
                    interpret=on_cpu, **kw_wc)
    if layout in ("tiled", "compact"):
        raise ValueError(f"layout={layout!r} requires the deferred path "
                         "(static faces); got an impl/topology fallback")
    # XLA paths: project exactly like optim.ham.project_verts
    ph = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], -1)
    rot = jnp.einsum("vk,bkl->bvl", ph, w2cs)
    clip = jnp.einsum("bvk,bkl->bvl", rot, projs)
    with_counters = kw.pop("with_counters", False)
    kw.pop("layout", None)       # image-layout only on the XLA paths
    kw.pop("winner_cap", None)   # deferred-path concept
    kw.pop("tiles_budget", None)  # deferred-path concept
    kw.pop("global_cap", None)   # deferred-path concept
    kw.pop("cull", None)         # deferred-path concept
    kw.pop("camera_grads", None)  # deferred-path concept
    out = render_pixels(clip, attr, faces, resolution, impl=impl,
                        aa_topology=aa_topology, **kw)
    if with_counters:
        # capacity counters are a deferred-path concept; the XLA oracle
        # paths are capacity-free, so they report zeros
        out = out + (jnp.zeros((clip.shape[0], 3), jnp.int32),)
    return out


def render_pixels(clip, attr, faces, resolution, impl="auto", aa_topology=None,
                  **kw):
    """Fused render: visibility + barycentrics + interpolation (+ AA
    weights) from ONE per-pixel gather.

    clip: [B, V, 4]; attr: [V, C] or [B, V, C]. Returns
    (rast [B,H,W,4], feat [B,H,W,C], aa_weights|None).

    On TPU, `impl='auto'` routes to the deferred-shading Pallas path
    (raster/deferred.py): one kernel pass yields the winning triangle's
    full record per pixel and a custom_vjp backward with no pixel-sized
    gathers or scatter-adds. A Pallas call is not GSPMD-partitionable —
    under multi-device sharding pass `mesh=` (and optionally
    `views_axis=`) so the deferred core runs under shard_map with each
    device rasterizing its own view shard (see dist/sharding.py).
    Explicit impl= values keep the XLA paths.

    The corner gather is the dominant per-pixel cost on the XLA paths
    (~10 ms per gather at 512²x4); concatenating clip and attributes into
    one table makes the whole differentiable render path pay it once.
    """
    from .antialias import antialias_weights  # cycle-free at call time

    if impl in ("auto", "deferred"):
        on_cpu = jax.default_backend() == "cpu"
        if impl == "deferred" or not on_cpu:
            topo_d = _deferred_topology_for(
                faces, clip.shape[1], face_order=kw.get("face_order"))
            if topo_d is not None:
                from .deferred import render_pixels_deferred

                return render_pixels_deferred(
                    clip, attr, topo_d, resolution,
                    max_span=kw.get("max_span"),
                    rows_budget=kw.get("rows_budget"),
                    with_aa=aa_topology is not None,
                    aa_budget=kw.get("aa_budget"),
                    mesh=kw.get("mesh"),
                    views_axis=kw.get("views_axis", "views"),
                    interpret=on_cpu)
    kw.pop("rows_budget", None)
    kw.pop("max_span", None)
    kw.pop("face_order", None)
    kw.pop("mesh", None)
    kw.pop("views_axis", None)
    aa_budget = kw.pop("aa_budget", None)
    if isinstance(aa_budget, str):
        if aa_budget != "auto":
            raise ValueError(
                f"aa_budget={aa_budget!r}: expected None, an int, an "
                "(h, v) pair, or 'auto'")
        aa_budget = None  # "auto" heuristic is deferred-path-only


    faces = jnp.asarray(faces, jnp.int32)
    h, w = resolution
    B = clip.shape[0]
    if attr.ndim == 2:
        attr = attr[None]
    if attr.shape[0] == 1 and B > 1:
        attr = jnp.broadcast_to(attr, (B,) + attr.shape[1:])
    C = attr.shape[-1]

    ids = jax.lax.stop_gradient(
        rasterize_ids(clip, faces, resolution, impl=impl, **kw)
    )
    F = faces.shape[0]
    face_idx = jnp.where(ids > 0, ids - 1, F)
    faces_ext = jnp.concatenate([faces, jnp.zeros((1, 3), jnp.int32)], axis=0)
    pix_faces = faces_ext[face_idx]  # [B, H, W, 3]

    table = jnp.concatenate([clip, attr], axis=-1)  # [B, V, 4+C]
    tri = jax.vmap(lambda t, i: t[i])(table, pix_faces.reshape(B, -1))
    tri = tri.reshape(ids.shape + (3, 4 + C))

    x, y, z, wc, sx, sy, iw = [], [], [], [], [], [], []
    for k in range(3):
        xk, yk, zk, wk = (tri[..., k, 0], tri[..., k, 1],
                          tri[..., k, 2], tri[..., k, 3])
        iwk = 1.0 / jnp.where(jnp.abs(wk) > W_EPS, wk, W_EPS)
        x.append(xk); y.append(yk); z.append(zk); wc.append(wk)
        iw.append(iwk); sx.append(xk * iwk); sy.append(yk * iwk)
    w_ok = (wc[0] > 0) & (wc[1] > 0) & (wc[2] > 0)
    ctx = {
        "ids": ids, "mask": ids > 0, "face_idx": face_idx,
        "x": x, "y": y, "z": z, "w": wc, "iw": iw,
        "sx": sx, "sy": sy, "w_ok": w_ok,
    }
    rast = barycentrics_from_context(ctx, resolution, clip.dtype)

    u = rast[..., 0:1]
    v = rast[..., 1:2]
    w2 = 1.0 - u - v
    feat = (u * tri[..., 0, 4:] + v * tri[..., 1, 4:] + w2 * tri[..., 2, 4:])
    feat = jnp.where(ctx["mask"][..., None], feat, 0.0)

    aa_w = None
    if aa_topology is not None:
        aa_w = antialias_weights(rast, clip, faces, aa_topology, context=ctx,
                                 budget=aa_budget)
    return rast, feat, aa_w


# kept for antialias.py (SoA helpers over the shared context)
def pixel_corner_indices(ids, faces):
    """ids [B, H, W] -> (f0, f1, f2) corner vertex indices, each [B, H, W]."""
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    face_idx = jnp.where(ids > 0, ids - 1, F)
    faces_ext = jnp.concatenate([faces, jnp.zeros((1, 3), jnp.int32)], axis=0)
    return tuple(faces_ext[:, k][face_idx] for k in range(3))


def gather_component(table, corner_idx):
    """table [B, V] (or [V]) gathered by corner_idx [B, H, W] -> [B, H, W]."""
    if table.ndim == 1:
        return table[corner_idx]
    return jax.vmap(lambda t, i: t[i])(table, corner_idx)
