"""Mesh-based neural renderer: forward pass + two-phase training.

TPU-native rebuild of `neural_render.py:41-221` with the canonical
rendering forward of `train_mlp.py:165-205` (MLP head) and
`train_unet.py:155-198` (UNet head):

  verts -> view transform -> rasterize -> interpolate
  [mask, view-space normals, albedo, uniform-random verts, 20-d features]
  -> icosahedral PE (3->87 for normals/albedo/pos) -> concat ray dirs
  -> per-pixel MLP (or dense UNet) -> sigmoid image.

Quirk kept (SURVEY.md §7): `uni_vertices` — the "position" channel fed to
the PE is a fresh uniform-random tensor per call (`train_mlp.py:171`).
`uni_mode='zeros'` disables it consciously.

Phase 1 trains the appearance net + vertex features with geometry frozen
(`neural_render.py:137-166`); phase 2 adds a second geometry-conditioned
net and unfreezes vertices/albedo with laplacian/edge/delta regularizers
(`:176-219`). Both phases are single jitted `lax.scan` loops.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.mesh import (
    MeshTopology, vertex_normals, edge_lengths_sq, laplacian_smoothing,
)
from ..nn.pe import IcosahedronEncoding
from ..nn.mlp import RenderMLP
from ..nn.unet import RenderUNet
from ..raster import render_pixels, render_scene
from .ham import project_verts, _make_batcher


def pad_to_multiple(x, mult=16):
    """Pad H/W of [B, H, W, C] up to a multiple (UNet needs /16; the
    reference pads W to /8, `train_unet.py:192-196`). Returns (padded,
    crop_slices)."""
    B, H, W, C = x.shape
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (slice(0, H), slice(0, W))


def neural_forward(
    apply_fn: Callable,
    params,
    pe: IcosahedronEncoding,
    ray,            # [B, H, W, 3]
    w2cs, projs,    # [B, 4, 4] transposed
    vertices,       # [V, 3]
    faces,
    albedo,         # [V, 3]
    vertex_feat,    # [V, 20]  (or img_z [B, H, W, 3] when if_geo)
    resolution,
    rng,
    if_geo: bool = False,
    uni_mode: str = "random",
    raster_kw: dict | None = None,
    with_counters: bool = False,
    incidence=None,
    layout: str = "image",
):
    """Returns (pred_imgs [B, H, W, 3], masks [B, H, W, 1]); with
    `with_counters=True` appends the deferred renderer's capacity
    counters [B, 3] (pairs dropped, winner-cap overflow,
    global-cap chunk drops — see
    raster.deferred; zeros on the XLA paths).

    `vertices` may be [V, 3] (one mesh, B camera views — the per-scan
    trainer) or [B, V, 3] (one mesh PER view — the category trainer,
    where the sample batch rides the rasterizer's view axis instead of a
    vmap; a Pallas core must not sit under vmap). albedo/vertex_feat may
    be per-sample [B, V, ·] or shared [V, ·] in the batched case.

    layout="compact" (single-mesh MLP path only): the render runs in the
    compact active-tile layout and ALL per-pixel math (PE + MLP) runs on
    [B, ta_cap+1, P, ·] rows instead of the dense image — `ray` must
    then be the TILED [B, T, 3, P] ray image (`deferred.tile_images`,
    gathered here through the per-view tile list), and the returns are
    compact rows (pred [B, TA1, P, 3], masks [B, TA1, P, 1], tlist
    [, counters]). Loss values over the compact rows match the dense
    image losses exactly: pixels outside active tiles are background
    (masks 0) in both.
    """
    B = w2cs.shape[0]
    H, W = resolution
    if uni_mode == "random":
        uni = jax.random.uniform(rng, vertices.shape)
    else:
        uni = jnp.zeros_like(vertices)

    # The reference interpolates VIEW-SPACE vertex normals
    # (`/root/reference/train_mlp.py:169-176`). The w2c rotation is
    # linear, so it commutes with barycentric interpolation: interpolate
    # world normals (making the attributes view-shared where possible —
    # the deferred core then streams ONE attribute table instead of B)
    # and rotate the per-pixel result.
    if vertices.ndim == 3:

        def bc(x):
            return (jnp.broadcast_to(x, (B,) + x.shape)
                    if x.ndim == 2 else x)

        ones = jnp.ones_like(vertices[..., :1])       # [B, V, 1]
        normals_w = jax.vmap(
            lambda v: vertex_normals(v, faces, incidence=incidence)
        )(vertices)
        attr = jnp.concatenate([ones, normals_w, bc(albedo), uni], -1)
        if not if_geo:
            attr = jnp.concatenate([attr, bc(vertex_feat)], -1)
        ph = jnp.concatenate([vertices, ones], -1)
        rot = jnp.einsum("bvk,bkl->bvl", ph, w2cs)
        clip = jnp.einsum("bvk,bkl->bvl", rot, projs)
        rast, feat, _ = render_pixels(clip, attr, faces, (H, W),
                                      **(raster_kw or {}))
        counters = jnp.zeros((B, 3), jnp.int32)  # category path: unaudited
    elif layout == "compact":
        from ..raster.deferred import gather_tiles

        ones = jnp.ones_like(vertices[:, :1])
        normals_w = vertex_normals(vertices, faces,
                                   incidence=incidence)  # [V, 3] world
        attr = jnp.concatenate([ones, normals_w, albedo, uni], -1)
        if not if_geo:
            attr = jnp.concatenate([attr, vertex_feat], -1)
        tr = render_scene(
            vertices, faces, w2cs, projs, attr, (H, W),
            aa_topology=None, layout="compact", **(raster_kw or {}))
        tlist = tr["tlist"]
        counters = tr["counters"]
        feat = jnp.moveaxis(tr["feat"], 2, -1)       # [B, TA1, P, C]
        # rays arrive TILED [B, T, 3, P]: gather active rows
        ray = jnp.moveaxis(gather_tiles(ray, tlist, tr["grid"]["T"]),
                           2, -1)                    # [B, TA1, P, 3]
        masks = feat[..., :1]
        nrm_view = jnp.einsum(
            "btpk,bkl->btpl", feat[..., 1:4], w2cs[:, :3, :3])
        feat = jnp.concatenate([feat[..., :1], nrm_view, feat[..., 4:]],
                               -1)
        if not if_geo:
            input_f = jnp.concatenate(
                [pe(feat[..., 1:4]), pe(feat[..., 4:7]),
                 pe(feat[..., 7:10]), ray, feat[..., 10:30]], -1)
        else:
            input_f = jnp.concatenate(
                [feat[..., 1:4], feat[..., 4:7], feat[..., 7:10],
                 vertex_feat], -1)
        out = apply_fn(params, input_f)
        pred = jnp.where(masks > 0, out, 0.0)
        if with_counters:
            return pred, masks, tlist, counters
        return pred, masks, tlist
    else:
        ones = jnp.ones_like(vertices[:, :1])
        normals_w = vertex_normals(vertices, faces,
                                   incidence=incidence)  # [V, 3] world
        attr = jnp.concatenate([ones, normals_w, albedo, uni], -1)
        if not if_geo:
            attr = jnp.concatenate([attr, vertex_feat], -1)
        out = render_scene(
            vertices, faces, w2cs, projs, attr, (H, W),
            with_counters=with_counters, **(raster_kw or {}))
        rast, feat = out[0], out[1]
        counters = out[3] if with_counters else jnp.zeros((B, 3), jnp.int32)
    masks = feat[..., :1]
    nrm_view = jnp.einsum(
        "bhwk,bkl->bhwl", feat[..., 1:4], w2cs[:, :3, :3])
    feat = jnp.concatenate([feat[..., :1], nrm_view, feat[..., 4:]], -1)

    if not if_geo:
        normal_map = pe(feat[..., 1:4])
        albedo_map = pe(feat[..., 4:7])
        pos = pe(feat[..., 7:10])
        vertex_f = feat[..., 10:30]
        input_f = jnp.concatenate([normal_map, albedo_map, pos, ray, vertex_f], -1)
    else:
        input_f = jnp.concatenate(
            [feat[..., 1:4], feat[..., 4:7], feat[..., 7:10], vertex_feat], -1
        )  # vertex_feat carries img_z here

    out = apply_fn(params, input_f)
    pred = jnp.where(masks > 0, out, 0.0)
    if with_counters:
        return pred, masks, counters
    return pred, masks


@dataclasses.dataclass
class NeuralRenderState:
    net_params: Any
    net_g_params: Any
    vertex_feat: jnp.ndarray
    vertices: jnp.ndarray
    albedo: jnp.ndarray


def train_neural_renderer(
    imgs, gt_masks, rays, w2cs, projs, vertices, faces, albedo,
    num_epochs: int = 200,
    batch: int = 2,
    feat_dim: int = 20,
    seed: int = 0,
    uni_mode: str = "random",
    mlp_width: int = 256,
    mlp_depth: int = 8,
    net_type: str = "mlp",
    init_state: "NeuralRenderState | None" = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 50,
):
    """Two-phase renderer training (net_type 'mlp' or 'unet'). Returns
    (NeuralRenderState, losses1, losses2, modules). Image tensors are
    [N, H, W, ...]; vertices/albedo [V, 3].

    `init_state` resumes from a previous NeuralRenderState (the
    reference's `continue_train`, `neural_render.py:100-106`).

    With `checkpoint_dir`, each phase's scan is segmented every
    `checkpoint_every` epochs and (params, opt state, rng key) snapshot
    via orbax under `<dir>/phase{1,2}`; on restart the phase resumes
    from the latest snapshot (a finished phase 1 is not re-run — its
    final snapshot restores directly). The reference loses the run on a
    crash (SURVEY.md §5).
    """
    imgs = jnp.asarray(imgs, jnp.float32)
    gt_masks = jnp.asarray(gt_masks, jnp.float32)
    rays = jnp.asarray(rays, jnp.float32)
    w2cs = jnp.asarray(w2cs, jnp.float32)
    projs = jnp.asarray(projs, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    albedo = jnp.asarray(albedo, jnp.float32)
    faces_np = np.asarray(faces, np.int32)
    faces = jnp.asarray(faces_np)

    N, H, W = imgs.shape[:3]
    V = vertices.shape[0]
    topo = MeshTopology.build(faces_np, V)
    edges, degrees = jnp.asarray(topo.edges), jnp.asarray(topo.degrees)
    pe = IcosahedronEncoding(min_deg=0, max_deg=1, scale=0.1)

    key = jax.random.PRNGKey(seed)
    k1, k2, key = jax.random.split(key, 3)
    in_dim = pe.embedding_size * 3 + 3 + feat_dim  # 284
    if net_type == "mlp":
        net = RenderMLP(width=mlp_width, depth=mlp_depth)
        net_g = RenderMLP(width=mlp_width, depth=mlp_depth)
        net_params = net.init(k1, jnp.zeros((1, in_dim)))
        net_g_params = net_g.init(k2, jnp.zeros((1, 12)))

        def apply_net(module):
            return lambda p, x: module.apply(p, x)
    else:
        net = RenderUNet(out_channels=3, feature_scale=2)
        net_g = RenderUNet(out_channels=3, feature_scale=2)
        net_params = net.init(k1, jnp.zeros((1, 32, 32, in_dim)))
        net_g_params = net_g.init(k2, jnp.zeros((1, 32, 32, 12)))

        def apply_net(module):
            def f(p, x):
                xp, crop = pad_to_multiple(x, 16)
                # PARITY: BatchNorm always runs in TRAIN mode (batch
                # statistics), updated running stats discarded — the
                # reference only ever calls `.train()` and never `.eval()`
                # (`/root/reference/train_unet.py:230`,
                # `neural_render.py:138,178`), so eval-time BN there also
                # normalizes by the live batch. Pinned by
                # tests/test_neural.py::test_unet_batchnorm_train_mode_parity.
                out = module.apply(p, xp, mutable=["batch_stats"])[0]
                return out[:, crop[0], crop[1]]
            return f
    vertex_feat = jnp.zeros((V, feat_dim))
    if init_state is not None:
        net_params = jax.device_put(init_state.net_params)
        if init_state.net_g_params is not None:
            net_g_params = jax.device_put(init_state.net_g_params)
        vertex_feat = jnp.asarray(init_state.vertex_feat)
        vertices = jnp.asarray(init_state.vertices, jnp.float32)
        albedo = jnp.asarray(init_state.albedo, jnp.float32)

    edge_mean = jnp.mean(edge_lengths_sq(vertices, faces))
    vertices_tmp = vertices

    # Size the deferred pass-A pair budget once from the start mesh over
    # ALL views (coverage is stable through training; audit has 1.3x
    # margin) — without this the renderer would run on the implicit
    # default cap, which can silently drop chunks on dense scenes.
    from ..raster.deferred import audit_deferred_rows, audit_active_tiles
    _clip0 = project_verts(vertices, w2cs, projs)
    # back-face culling + view-summed backward, same policy as
    # optim/ham.py (cull: auto-detected, exact only on closed
    # consistently-wound meshes; camera_grads=False: cameras are
    # constants in both NR phases)
    _cull_env = os.environ.get("FMHR_CULL", "auto")
    if _cull_env == "auto":
        from ..raster.deferred import detect_cull_sign

        _cull = detect_cull_sign(np.asarray(vertices), faces_np,
                                 np.asarray(w2cs), np.asarray(projs))
    else:
        _cull = int(_cull_env)
    _, _rows_budget = audit_deferred_rows(_clip0, faces_np, (H, W),
                                          cull=_cull)
    raster_kw = {"rows_budget": _rows_budget, "camera_grads": False}
    if _cull:
        raster_kw["cull"] = _cull
    # active-tile grid compaction (see optim/ham.py): audited per-view
    # tile lists drop the background grid steps, bit-identically.
    if os.environ.get("FMHR_TILES_COMPACT", "1") != "0":
        _, _tiles_budget = audit_active_tiles(_clip0, faces_np, (H, W),
                                              cull=_cull)
        raster_kw["tiles_budget"] = _tiles_budget
    # oversize-chunk (global-list) cap, audited like rows/tiles (r5)
    from ..raster.deferred import audit_global_chunks
    _, _g_cap = audit_global_chunks(_clip0, faces_np, (H, W), cull=_cull)
    raster_kw["global_cap"] = _g_cap

    # Round 5: train in the COMPACT render layout when the tile audit is
    # on and the head is the per-pixel MLP — PE + MLP then run on active
    # tile rows only (FMHR_LAYOUT=tiled restores dense for A/B). Loss
    # values are exact (outside active tiles the render mask is 0 in
    # both layouts, so those pixels never enter the pooled loss).
    train_layout = "image"
    if (net_type == "mlp" and raster_kw.get("tiles_budget") is not None
            and jax.default_backend() != "cpu"
            and os.environ.get("FMHR_LAYOUT", "compact") == "compact"):
        train_layout = "compact"

    # Image-sized tensors (imgs/rays/masks, ~500 MB at the full-res demo)
    # travel as jit ARGUMENTS through `data` — baking them into the
    # program as closure constants overflows the remote compiler's
    # request-size limit (HTTP 413; same fix as optim/ham.py).
    if train_layout == "compact":
        from ..raster.deferred import tile_images

        data = {"imgs": tile_images(imgs, (H, W)),       # [N, T, 3, P]
                "masks": tile_images(gt_masks, (H, W)),  # [N, T, P]
                "rays": tile_images(rays, (H, W))}
    else:
        data = {"imgs": imgs, "masks": gt_masks, "rays": rays}

    def render(net_p, vf, verts, alb, idx, rng, data, if_geo=False,
               geo_p=None, img_z=None, with_counters=False):
        f = apply_net(net_g) if if_geo else apply_net(net)
        return neural_forward(
            f, geo_p if if_geo else net_p, pe,
            data["rays"][idx], w2cs[idx], projs[idx],
            verts, faces, alb,
            img_z if if_geo else vf,
            (H, W), rng, if_geo=if_geo, uni_mode=uni_mode,
            raster_kw=raster_kw, with_counters=with_counters,
            incidence=topo.vert_slot_incidence, layout=train_layout,
        )

    def gathered_targets(idx, tlist):
        """compact layout: image/mask targets for the active rows."""
        from ..raster.deferred import gather_tiles

        from ..raster.deferred import tile_grid
        T = tile_grid((H, W))["T"]
        img_g = jnp.moveaxis(
            gather_tiles(data["imgs"][idx], tlist, T), 2, -1)
        mask_g = gather_tiles(data["masks"][idx], tlist, T)
        return img_g, mask_g

    def segmented_scan(run_seg, params, state, key, batches, steps_pe,
                       subdir, empty=None):
        # (data rides via closure over the OUTER python var but is passed
        # to the jitted run_seg as an argument below)
        """Drive a jitted scan segment-by-segment with orbax snapshots.

        run_seg: (params, state, key, batch_seg) -> (params, state, key,
        losses) where losses may be any pytree of [steps, ...] arrays
        (phase 2 carries (losses, overflow counters)). `empty` is the
        zero-length pytree returned when everything was already
        checkpointed. Snapshots after every segment (including the last,
        so a later phase's crash never re-runs this one).
        """
        total = int(batches.shape[0])
        cdir = (os.path.join(checkpoint_dir, subdir)
                if checkpoint_dir is not None else None)
        # segments are bounded even WITHOUT checkpointing: one device
        # execution of a multi-minute monolithic scan is where the
        # tunneled backend's full-res runs died (round-4 logs); a host
        # sync between segments costs nothing. FMHR_MAX_SEG_STEPS caps
        # the segment further (steps) for backends with execution
        # deadlines.
        seg_len = max(1, checkpoint_every * steps_pe)
        _cap = int(os.environ.get("FMHR_MAX_SEG_STEPS", "0"))
        if _cap > 0:
            seg_len = max(1, min(seg_len, _cap))
        start = 0
        if cdir is not None:
            from ..utils.checkpoint import latest_step, load_checkpoint

            last = latest_step(cdir)
            if last is not None:
                params, state, key = load_checkpoint(
                    cdir, (params, state, key), last)
                start = min(int(last), total)
        chunks = []
        k = start
        while k < total:
            end = min(total, k + seg_len)
            params, state, key, losses = run_seg(
                params, state, key, batches[k:end], data)
            chunks.append(losses)
            k = end
            if cdir is not None:
                from ..utils.checkpoint import save_checkpoint

                save_checkpoint(cdir, (params, state, key), k)
        if chunks:
            losses = jax.tree.map(lambda *xs: jnp.concatenate(xs), *chunks)
        else:
            losses = empty if empty is not None else jnp.zeros(
                (0,), jnp.float32)
        return params, state, key, losses

    # ---------------- phase 1: net + vertex_feat ---------------------------
    batches1, steps_pe1 = _make_batcher(N, batch, num_epochs, seed)
    opt1 = optax.adam(1e-4)

    @jax.jit
    def run_phase1_seg(params, state, key, batch_seg, data):
        def loss_fn(p, idx, rng):
            if train_layout == "compact":
                pred, masks, tlist = render(p["net"], p["vf"], vertices,
                                            albedo, idx, rng, data)
                img_g, mask_g = gathered_targets(idx, tlist)
            else:
                pred, masks = render(p["net"], p["vf"], vertices, albedo,
                                     idx, rng, data)
                img_g, mask_g = data["imgs"][idx], data["masks"][idx]
            valid = ((masks[..., 0] > 0)
                     & (mask_g > 0)).astype(jnp.float32)
            h = optax.huber_loss(pred, img_g, delta=1.0)
            num = jnp.sum(h * valid[..., None])
            den = jnp.maximum(jnp.sum(valid) * 3, 1.0)
            return 100.0 * num / den

        def step(carry, xs):
            p, s, k = carry
            idx = xs
            k, sub = jax.random.split(k)
            loss, g = jax.value_and_grad(loss_fn)(p, idx, sub)
            upd, s = opt1.update(g, s)
            return (optax.apply_updates(p, upd), s, k), loss

        (p, s, k), losses = jax.lax.scan(step, (params, state, key), batch_seg)
        return p, s, k, losses

    k3, key = jax.random.split(key)
    params1 = {"net": net_params, "vf": vertex_feat}
    params1, _, _, losses1 = segmented_scan(
        run_phase1_seg, params1, opt1.init(params1), k3, batches1,
        steps_pe1, "phase1")
    net_params, vertex_feat = params1["net"], params1["vf"]

    # ---------------- phase 2: + net_g, vertices, albedo -------------------
    batches2, steps_pe2 = _make_batcher(N, batch, num_epochs, seed + 1)
    opt2 = optax.multi_transform(
        {
            "net": optax.adam(1e-4), "net_g": optax.adam(5e-4),
            "verts": optax.adam(5e-4), "albedo": optax.adam(5e-4),
            "vf": optax.adam(1e-4),
        },
        {"net": "net", "net_g": "net_g", "verts": "verts",
         "albedo": "albedo", "vf": "vf"},
    )

    @jax.jit
    def run_phase2_seg(params, state, key, batch_seg, data):
        def loss_fn(p, idx, rng):
            r1, r2 = jax.random.split(rng)
            if train_layout == "compact":
                render_z, masks, tlist, counters = render(
                    p["net"], p["vf"], p["verts"], p["albedo"], idx, r1,
                    data, with_counters=True)
                # same mesh + cameras -> identical tlist in both renders
                pred, masks, _tl2 = render(
                    None, None, p["verts"], p["albedo"], idx, r2, data,
                    if_geo=True, geo_p=p["net_g"],
                    img_z=jax.lax.stop_gradient(render_z),
                )
                img_t, mask_t = gathered_targets(idx, tlist)
            else:
                render_z, masks, counters = render(
                    p["net"], p["vf"], p["verts"], p["albedo"], idx, r1,
                    data, with_counters=True)
                pred, masks = render(
                    None, None, p["verts"], p["albedo"], idx, r2, data,
                    if_geo=True, geo_p=p["net_g"],
                    img_z=jax.lax.stop_gradient(render_z),
                )
                img_t, mask_t = data["imgs"][idx], data["masks"][idx]
            valid = ((masks[..., 0] > 0)
                     & (mask_t > 0)).astype(jnp.float32)

            def ml1(a, b):
                num = jnp.sum(jnp.abs(a - b) * valid[..., None])
                return num / jnp.maximum(jnp.sum(valid) * 3, 1.0)

            img_loss = ml1(pred, img_t)
            imgz_loss = ml1(render_z, img_t)
            lap = 100.0 * laplacian_smoothing(
                p["verts"], edges, degrees,
                nbr_incidence=topo.nbr_incidence)
            el = edge_lengths_sq(p["verts"], faces)
            edge_loss = 150000.0 * jnp.mean(jnp.clip(el - edge_mean, 0.0, 1.0))
            delta_loss = 50000.0 * jnp.mean(
                jnp.sum((vertices_tmp - p["verts"]) ** 2, -1)
            )
            # counters ride along so a drifting mesh that outgrows the
            # setup-time budget audit is visible in the trace (VERDICT
            # r2 #7)
            return (img_loss + imgz_loss + lap + edge_loss + delta_loss,
                    counters.sum(0))

        def step(carry, xs):
            p, s, k = carry
            k, sub = jax.random.split(k)
            (loss, counters), g = jax.value_and_grad(
                loss_fn, has_aux=True)(p, xs, sub)
            upd, s = opt2.update(g, s)
            return (optax.apply_updates(p, upd), s, k), (loss, counters)

        (p, s, k), (losses, counters) = jax.lax.scan(
            step, (params, state, key), batch_seg)
        return p, s, k, (losses, counters)

    k4, key = jax.random.split(key)
    params2 = {"net": net_params, "net_g": net_g_params, "vf": vertex_feat,
               "verts": vertices, "albedo": albedo}
    p, _, _, (losses2, counters2) = segmented_scan(
        run_phase2_seg, params2, opt2.init(params2), k4, batches2,
        steps_pe2, "phase2",
        empty=(jnp.zeros((0,), jnp.float32), jnp.zeros((0, 3), jnp.int32)))
    total_overflow = np.asarray(counters2).sum(0) if counters2.size else \
        np.zeros(3, np.int64)
    if total_overflow.any():
        import warnings

        warnings.warn(
            "neural-render phase 2 rendered with capacity overflow: "
            f"{int(total_overflow[0])} (tile,chunk) pairs dropped, "
            f"{int(total_overflow[1])} winner-cap overflows, and "
            f"{int(total_overflow[2])} global-cap chunk drops across all "
            "steps — the optimized mesh drifted past the setup-time "
            "budget audit; raise rows_budget/winner_cap.", stacklevel=2)

    state = NeuralRenderState(
        net_params=p["net"], net_g_params=p["net_g"],
        vertex_feat=p["vf"], vertices=p["verts"], albedo=p["albedo"],
    )
    return state, np.asarray(losses1), np.asarray(losses2), (net, net_g, pe)
