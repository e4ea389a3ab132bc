"""HAM: joint mesh-displacement + albedo + SH-lighting optimization.

TPU-native rebuild of the reference's core workload `mesh_sfs_optim.py`
(the "HAM optimizer", `README.md:54,73`):

  0. SH init — per-view least squares of the reference SH basis on
     rendered normals vs. the gray image (`mesh_sfs_optim.py:124-174`).
     The reference round-trips to numpy lstsq per view; here the normal
     equations (9x9) are accumulated ON DEVICE with masked segment sums —
     no host sync.
  1. Stage A — optimize per-vertex albedo + per-view SH coefficients
     against the shaded L1 loss (`:195-240`).
  2. Stage B — optimize vertex displacement delta + albedo jointly with
     sfs/laplacian/albedo-laplacian/mask/edge/delta losses (`:242-318`),
     halving... dividing albedo_weight by 1e4 at the midpoint (`:250-251`).

Both stages run as ONE jitted `lax.scan` each: per-epoch permutations are
generated on device, minibatch view gathers are dynamic slices, and the
loss trace stays on device until the end (the reference syncs per step via
`.item()` and `torch.randperm().cuda()`, `:198,239,249,312`).

Faithful quirks kept (see SURVEY.md §7): the Stage-B mask loss pulls the
rendered mask toward the INITIAL mesh's antialiased mask (valid_masks from
the init pass, `:158,259,295`), not the data mask; Stage B freezes the SH
coefficients (the reference marks them requires_grad_(False) at `:243` so
Adam receives no gradient for them).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.mesh import (
    MeshTopology, vertex_normals, edge_lengths_sq, laplacian_smoothing,
    safe_normalize, uniform_laplacian,
)
from ..core.sh import sh_basis, sh_radiance
from ..raster import (rasterize, render_pixels, render_scene, interpolate,
                      antialias, antialias_weights, apply_antialias, AATopology)
from ..raster.antialias import apply_antialias_tiled
from ..raster.deferred import tile_images
from ..utils.config import Config

# Host-sync seam: the OOM-fallback test injects a fake RESOURCE_EXHAUSTED
# here without mutating the global jax module (ADVICE r4).
_sync = jax.block_until_ready


@dataclasses.dataclass
class HamConfig:
    width: int = 1280
    height: int = 1024
    epoch_albedo: int = 150
    epoch_sfs: int = 300
    sfs_weight: float = 50.0
    lap_weight: float = 2000.0
    albedo_weight: float = 1.0
    mask_weight: float = 1000.0
    edge_weight: float = 500000.0
    delta_weight: float = 50000.0
    degree: int = 3
    batch: int = 8
    lr: float = 1e-4
    albedo_lr: float = 0.005
    sh_lr: float = 0.005
    seed: int = 0
    # per-tile rasterizer bin capacity; None = default heuristic. Size via
    # raster.visibility.audit_bin_counts for dense (subdiv-3) meshes.
    raster_capacity: int | None = None
    # deferred-path cap on DISTINCT winning chunks per tile (None = the
    # renderer default, 128); raise when the overflow warning fires
    winner_cap: int | None = None
    # "auto" = tiled training losses (no untile/retile transposes, see
    # raster/deferred.py tiled layout) whenever the deferred Pallas path
    # is live (non-CPU); True/False force. Loss values and gradients are
    # identical to the image-layout losses (tests/test_deferred.py).
    tiled_loss: bool | str = "auto"
    # View micro-batching: render + backprop the per-step view batch in
    # chunks of this many views, accumulating EXACT gradients (the L1/MSE
    # denominators are gradient-free, so the chunked gradient equals the
    # unchunked one — tests/test_optim.py::test_ham_microbatch_grads).
    # Peak per-pixel fwd+bwd residual memory then scales with the CHUNK,
    # not the batch: the reference's flagship 1280x1024 demo step needs
    # ~21.5 GB unchunked (VERDICT r3 #1, scripts/tpu_logs/
    # r3_demo_fullres.log) vs 16 GB HBM on v5e. "auto" sizes the chunk
    # from the device memory budget (no chunking when the step fits,
    # e.g. the 334x512 prod workload); an int forces; None/0 disables.
    view_microbatch: int | str | None = "auto"

    @classmethod
    def from_config(cls, conf: Config) -> "HamConfig":
        return cls(
            width=conf.get_int("w"),
            height=conf.get_int("h"),
            epoch_albedo=conf.get_int("epoch_albedo"),
            epoch_sfs=conf.get_int("epoch_sfs"),
            sfs_weight=conf.get_float("sfs_weight"),
            lap_weight=conf.get_float("lap_weight"),
            albedo_weight=conf.get_float("albedo_weight"),
            mask_weight=conf.get_float("mask_weight"),
            edge_weight=conf.get_float("edge_weight"),
            delta_weight=conf.get_float("delta_weight"),
            degree=conf.get_int("degree"),
            batch=conf.get_int("batch"),
            lr=conf.get_float("lr"),
            albedo_lr=conf.get_float("albedo_lr"),
            sh_lr=conf.get_float("sh_lr"),
        )


def project_verts(vertices, w2c, proj):
    """vertices [V, 3]; w2c/proj [B, 4, 4] transposed -> clip [B, V, 4]."""
    ones = jnp.ones_like(vertices[:, :1])
    ph = jnp.concatenate([vertices, ones], -1)  # [V, 4]
    rot = jnp.einsum("vk,bkl->bvl", ph, w2c)
    return jnp.einsum("bvk,bkl->bvl", rot, proj)


def _masked_l1(pred, target, valid):
    """Mean |pred-target| over valid pixels (channels averaged)."""
    num = jnp.sum(jnp.abs(pred - target) * valid[..., None])
    den = jnp.maximum(jnp.sum(valid) * pred.shape[-1], 1.0)
    return num / den


def sh_init(
    grayimgs, imgs, masks, w2cs, projs, vertices, faces, topo_aa, cfg,
    view_chunk: int = 4, raster_kw: dict | None = None,
):
    """Per-view + global SH least squares and albedo mean, on device.

    Returns (sh_coeffs [N, d2], albedo_init [V, 3], valid_masks [N, H, W]).
    """
    N = w2cs.shape[0]
    res = (cfg.height, cfg.width)
    d2 = cfg.degree ** 2
    raster_kw = raster_kw or {}
    normals = vertex_normals(vertices, faces)  # [V, 3] world space

    def one_chunk(w2c, proj, mask, gray, img):
        rast, feat, aa_w = render_scene(
            vertices, faces, w2c, proj,
            jnp.concatenate([normals, jnp.ones_like(normals[:, :1])], -1),
            res, aa_topology=topo_aa, **raster_kw,
        )
        pred_mask = apply_antialias(feat[..., 3:4], aa_w)[..., 0]
        pred_normals = safe_normalize(apply_antialias(feat[..., :3], aa_w))
        valid = (mask > 0) & (rast[..., 3] > 0)  # [b, H, W]
        basis = sh_basis(pred_normals, cfg.degree)  # [b, H, W, d2]
        vb = valid[..., None] * basis
        # normal equations per view: M = B^T B, y = B^T gray
        M = jnp.einsum("bhwi,bhwj->bij", vb, basis)
        y = jnp.einsum("bhwi,bhw->bi", vb, gray)
        return M, y, pred_mask, pred_normals, valid

    Ms, ys, pred_masks, all_normals, all_valid = [], [], [], [], []
    for k in range(0, N, view_chunk):
        sl = slice(k, min(N, k + view_chunk))
        M, y, pm, pn, va = jax.jit(one_chunk)(
            w2cs[sl], projs[sl], masks[sl], grayimgs[sl], imgs[sl]
        )
        Ms.append(M); ys.append(y); pred_masks.append(pm)
        all_normals.append(pn); all_valid.append(va)
    M = jnp.concatenate(Ms); y = jnp.concatenate(ys)

    eye = jnp.eye(d2) * 1e-6
    sh_coeffs = jax.vmap(lambda m, v: jnp.linalg.solve(m + eye, v))(M, y)  # [N, d2]
    sh_global = jnp.linalg.solve(M.sum(0) + eye, y.sum(0))

    # albedo init: mean over valid pixels of img / radiance(global sh)
    num = jnp.zeros(3)
    den = jnp.zeros(())
    for pn, va, k in zip(all_normals, all_valid, range(0, N, view_chunk)):
        sl = slice(k, min(N, k + view_chunk))
        rad = sh_radiance(sh_global, pn, cfg.degree)[..., None]
        safe = jnp.where(jnp.abs(rad) > 1e-6, rad, 1e-6)
        num = num + jnp.sum(jnp.where(va[..., None], imgs[sl] / safe, 0.0), (0, 1, 2))
        den = den + jnp.sum(va)
    albedo_mean = num / jnp.maximum(den, 1.0)
    albedo_init = jnp.broadcast_to(albedo_mean, vertices.shape)

    return sh_coeffs, albedo_init, jnp.concatenate(pred_masks)


def _make_batcher(num: int, batch: int, epochs: int, seed: int):
    """Precompute per-epoch permutations; returns [steps, batch] index array
    (wraparound padding when batch doesn't divide num)."""
    steps_per_epoch = math.ceil(num / batch)
    keys = jax.random.split(jax.random.PRNGKey(seed), epochs)
    perms = jax.vmap(lambda k: jax.random.permutation(k, num))(keys)  # [E, num]
    pad = steps_per_epoch * batch - num
    perms = jnp.concatenate([perms, perms[:, :pad]], axis=1) if pad else perms
    return perms.reshape(epochs * steps_per_epoch, batch), steps_per_epoch


# Measured fwd+bwd residual footprint of one HAM stage-B step: ~2.1 KB
# per ray (pixel x view). Anchor: the 1280x1024 x 8-view step requested
# 21.5 GB (r3_demo_fullres.log, 10.5 Mrays); the 334x512 x 16-view prod
# step (2.7 Mrays, ~5.7 GB) runs comfortably in 16 GB HBM.
_BYTES_PER_RAY = 2100.0


def _device_memory_budget() -> float:
    """Usable HBM bytes for the step's per-pixel intermediates (with a
    conservative margin for face tables, params, and fragmentation)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = float(stats.get("bytes_limit", 16 * 2 ** 30))
    except Exception:
        limit = 16.0 * 2 ** 30
    return 0.60 * limit


def resolve_view_microbatch(setting, batch: int, height: int,
                            width: int, tile_active_frac: float = 1.0) -> int:
    """Views per micro-step. Returns `batch` (no chunking) when the whole
    step's residual estimate fits the budget; otherwise the largest
    divisor of `batch` that fits (>=1). `FMHR_VIEW_MICROBATCH` overrides.

    `tile_active_frac` is (active tiles)/(dense tiles) from
    `audit_active_tiles`: the _BYTES_PER_RAY anchor was measured on the
    DENSE grid, and the tile-shaped residuals (the bulk of the footprint
    — saved pix/slot buffers, pass-B output, cotangents) shrink with the
    compacted grid. 20% of the estimate is held tile-independent
    (image-layout inputs, face tables); a real OOM still degrades
    gracefully via the segment-level fallback.
    """
    env = os.environ.get("FMHR_VIEW_MICROBATCH")
    if env:
        setting = int(env)
    if setting in (None, 0):
        return batch
    if setting != "auto":
        m = max(1, min(batch, int(setting)))
    else:
        if jax.default_backend() == "cpu":
            return batch  # tests/interpret mode: host RAM, no HBM wall
        frac = min(1.0, max(0.0, float(tile_active_frac)))
        per_ray = _BYTES_PER_RAY * (0.2 + 0.8 * frac)
        fit = _device_memory_budget() / (per_ray * height * width)
        m = max(1, min(batch, int(fit)))
    while batch % m:
        m -= 1
    return m


def stage_b_terms_compact(tr, imgs_t, masks_t, vmask_t, vmask_sq_sum,
                          sh, degree):
    """Stage-B photometric terms on the COMPACT render layout
    (`render_scene(..., layout="compact")`): all per-pixel math runs on
    [n, ta_cap+1, ...] active-tile rows instead of the dense tile grid.

    imgs_t/masks_t/vmask_t: DENSE tiled [n, T, ...] tensors for the
    selected views (gathered here through tr["tlist"]); vmask_sq_sum:
    scalar sum of vmask^2 over the SAME views' full dense grid — the
    constant contribution of the inactive tiles to the mask SSE, where
    pred_mask is exactly 0:
        sse_full = sum_active[(pm - m)^2 - m^2] + sum_all m^2.
    Values/grads match the dense tiled formulation to fp-reassociation.

    Returns (num, sse, den).
    """
    from ..raster.deferred import gather_tiles
    from ..raster.antialias import apply_antialias_compact

    T = tr["grid"]["T"]
    tlist = tr["tlist"]
    imgs_g = gather_tiles(imgs_t, tlist, T)      # [n, TA1, 3, P]
    masks_g = gather_tiles(masks_t, tlist, T)    # [n, TA1, P]
    vm_g = gather_tiles(vmask_t, tlist, T)
    feat, aa_w = tr["feat"], tr["aa"]
    pred_normals = safe_normalize(feat[:, :, :3], axis=2)
    rast_albedo = feat[:, :, 3:6]
    pred_mask = (apply_antialias_compact(feat[:, :, 6:7], aa_w)[:, :, 0]
                 * tr["grid"]["valid"])
    valid = ((masks_g > 0) & (tr["ids"] > 0)).astype(feat.dtype)
    rad = sh_radiance(sh[:, None, None, :], pred_normals, degree, axis=2)
    pred = rad[:, :, None] * rast_albedo
    tmp = jnp.where(valid[:, :, None] > 0, pred, 0.0)
    tmp = apply_antialias_compact(tmp, aa_w)
    num = jnp.sum(jnp.abs(tmp - imgs_g) * valid[:, :, None])
    den = jnp.sum(valid) * 3.0
    sse = jnp.sum((pred_mask - vm_g) ** 2 - vm_g ** 2) + vmask_sq_sum
    return num, sse, den


def stage_a_terms_compact(tr, imgs_t, masks_t, sh, degree):
    """Stage-A pooled masked-L1 terms on the compact layout (normals and
    albedo are antialiased BEFORE shading, as in the reference's stage A).
    Returns (num, den)."""
    from ..raster.deferred import gather_tiles
    from ..raster.antialias import apply_antialias_compact

    T = tr["grid"]["T"]
    tlist = tr["tlist"]
    imgs_g = gather_tiles(imgs_t, tlist, T)
    masks_g = gather_tiles(masks_t, tlist, T)
    feat, aa_w = tr["feat"], tr["aa"]
    pred_normals = safe_normalize(
        apply_antialias_compact(feat[:, :, :3], aa_w), axis=2)
    rast_albedo = apply_antialias_compact(feat[:, :, 3:6], aa_w)
    valid = ((masks_g > 0) & (tr["ids"] > 0)).astype(feat.dtype)
    rad = sh_radiance(sh[:, None, None, :], pred_normals, degree, axis=2)
    pred = rad[:, :, None] * rast_albedo
    num = jnp.sum(jnp.abs(pred - imgs_g) * valid[:, :, None])
    den = jnp.sum(valid) * 3.0
    return num, den


def accumulate_view_grads(params, idx, m: int, view_terms):
    """Gradient accumulation over view chunks with EXACT pooled-loss
    gradients.

    view_terms(params, idx_m) must return ((num, sse), (den, counters)):
    the UNNORMALIZED photometric L1 numerator, the mask SSE, the
    (gradient-free) valid-count denominator, and capacity counters [3].
    Because den is constant w.r.t. params, d(Σnum/Σden)/dp =
    (Σ d num_c/dp)/Σden — so accumulating the num and sse cotangent
    pulls separately and scaling once at the end reproduces the
    unchunked gradient exactly (up to fp reassociation). Each chunk's
    fwd+bwd completes inside its scan iteration, so only one chunk's
    per-pixel residuals are ever live.

    Returns (g_num, g_sse, num, sse, den, counters).
    """
    n = idx.shape[0] // m
    idx_c = idx.reshape(n, m)
    zeros = jax.tree.map(jnp.zeros_like, params)

    def body(acc, idxm):
        gn, gs, num, sse, den, ctr = acc
        (num_c, sse_c), vjp_fn, (den_c, ctr_c) = jax.vjp(
            lambda pp: view_terms(pp, idxm), params, has_aux=True)
        one = jnp.ones_like(num_c)
        zero = jnp.zeros_like(num_c)
        (gn_c,) = vjp_fn((one, zero))
        (gs_c,) = vjp_fn((zero, one))
        add = lambda a, b: jax.tree.map(jnp.add, a, b)
        return (add(gn, gn_c), add(gs, gs_c), num + num_c, sse + sse_c,
                den + den_c, ctr + ctr_c), None

    init = (zeros, zeros, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
            jnp.zeros(3, jnp.int32))
    (gn, gs, num, sse, den, ctr), _ = jax.lax.scan(body, init, idx_c)
    return gn, gs, num, sse, den, ctr


def _is_memory_error(e: Exception) -> bool:
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "exceed memory" in s
            or "Out of memory" in s or "out of memory" in s)


def rerender_ham(vertices, faces, albedo, sh_coeffs, w2cs, projs, res,
                 raster_kw: dict | None = None, view_chunk: int = 2):
    """Re-render the optimized HAM model on the given cameras.

    Mirrors the reference's end-of-run rerenders
    (`/root/reference/mesh_sfs_optim.py:326-343`): shaded image =
    SH radiance(per-view coeffs, interpolated normals) x interpolated
    albedo, antialiased, zero outside coverage. Returns
    (imgs [N, H, W, 3] np.float32, masks [N, H, W] np.float32).
    Views render in chunks so full-resolution rerenders fit HBM.
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    albedo = jnp.asarray(albedo, jnp.float32)
    sh_coeffs = jnp.asarray(sh_coeffs, jnp.float32)
    faces_np = np.asarray(faces, np.int32)
    faces = jnp.asarray(faces_np)
    topo_aa = AATopology.build(faces_np, int(vertices.shape[0]))
    raster_kw = raster_kw or {}
    degree = int(round(math.sqrt(sh_coeffs.shape[-1])))
    normals = vertex_normals(vertices, faces)

    @jax.jit
    def one(w2c, proj, sh):
        rast, feat, aa_w = render_scene(
            vertices, faces, w2c, proj,
            jnp.concatenate([normals, albedo], -1),
            res, aa_topology=topo_aa, **raster_kw,
        )
        pred_normals = safe_normalize(apply_antialias(feat[..., :3], aa_w))
        rast_albedo = apply_antialias(feat[..., 3:6], aa_w)
        rad = sh_radiance(sh[:, None, None, :], pred_normals, degree)
        img = rad[..., None] * rast_albedo
        mask = (rast[..., 3] > 0).astype(jnp.float32)
        return img * mask[..., None], mask

    N = w2cs.shape[0]
    imgs_out, masks_out = [], []
    for k in range(0, N, view_chunk):
        sl = slice(k, min(N, k + view_chunk))
        img, mask = one(jnp.asarray(w2cs[sl]), jnp.asarray(projs[sl]),
                        sh_coeffs[sl])
        imgs_out.append(np.asarray(img))
        masks_out.append(np.asarray(mask))
    return np.concatenate(imgs_out), np.concatenate(masks_out)


def mesh_quality_stats(verts0, verts1, faces) -> dict:
    """Geometry sanity statistics for the quality report (VERDICT r3 #2):
    edge-length distribution before/after, displacement norms, uniform-
    Laplacian residual norms. All plain floats."""
    verts0 = np.asarray(verts0, np.float64)
    verts1 = np.asarray(verts1, np.float64)
    faces_np = np.asarray(faces, np.int64)

    def edge_stats(v):
        e = np.concatenate([faces_np[:, [0, 1]], faces_np[:, [1, 2]],
                            faces_np[:, [2, 0]]])
        el = np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=-1)
        return dict(mean=float(el.mean()), std=float(el.std()),
                    p99=float(np.percentile(el, 99)), max=float(el.max()))

    topo = MeshTopology.build(np.asarray(faces, np.int32),
                              verts0.shape[0])

    def lap_norm(v):
        lv = np.asarray(uniform_laplacian(
            jnp.asarray(v, jnp.float32), jnp.asarray(topo.edges),
            jnp.asarray(topo.degrees)))
        return float(np.linalg.norm(lv, axis=-1).mean())

    disp = np.linalg.norm(verts1 - verts0, axis=-1)
    return {
        "edges_before": edge_stats(verts0),
        "edges_after": edge_stats(verts1),
        "lap_before": lap_norm(verts0),
        "lap_after": lap_norm(verts1),
        "disp_mean": float(disp.mean()),
        "disp_p95": float(np.percentile(disp, 95)),
        "disp_max": float(disp.max()),
    }


def run_ham(
    imgs, grayimgs, masks, w2cs, projs, vertices, faces, cfg: HamConfig,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 50,
    warm_start: dict | None = None,
):
    """Full HAM optimization. All image/camera args [N, ...] jnp/np arrays;
    vertices [V, 3] the x3-subdivided initial mesh; faces [F, 3].

    With `checkpoint_dir`, stage B snapshots (params, opt state, step)
    every `checkpoint_every` epochs via orbax and resumes from the latest
    snapshot on restart (the reference loses the run on a crash,
    SURVEY.md §5). Returns dict with optimized vertices/delta/albedo/
    sh_coeffs and the loss traces of both stages.

    `warm_start` = {"albedo": [V,3], "sh_coeffs": [N,d2], "delta": [V,3]}
    (any subset) seeds the optimization from a previous frame's result —
    the sequence mode of `conf/ih_sfsseq.conf` (10+5 epochs/frame only
    make sense warm-started).
    """
    imgs = jnp.asarray(imgs, jnp.float32)
    grayimgs = jnp.asarray(grayimgs, jnp.float32)
    masks = jnp.asarray(masks, jnp.float32)
    w2cs = jnp.asarray(w2cs, jnp.float32)
    projs = jnp.asarray(projs, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    faces_np = np.asarray(faces, np.int32)
    faces = jnp.asarray(faces_np)

    V = vertices.shape[0]
    N = imgs.shape[0]
    res = (cfg.height, cfg.width)
    topo = MeshTopology.build(faces_np, V)
    topo_aa = AATopology.build(faces_np, V)
    edges = jnp.asarray(topo.edges)
    degrees = jnp.asarray(topo.degrees)
    slot_inc = topo.vert_slot_incidence
    nbr_inc = topo.nbr_incidence

    raster_kw = (
        {"capacity": int(cfg.raster_capacity)}
        if cfg.raster_capacity else {}
    )
    if cfg.winner_cap:
        raster_kw["winner_cap"] = int(cfg.winner_cap)
    # auto-size the deferred record budget once at setup (static after;
    # VERDICT: no silent drops — the audit sizes for the actual scene).
    # Note: faces stay in subdivision order — its contiguous 4^k child
    # patches bin TIGHTER than Morton/Hilbert centroid orders at
    # subpixel density (measured 16.0k vs 21.3k/21.0k pairs at ih).
    from ..raster.deferred import audit_deferred_rows, audit_active_tiles

    clip0 = project_verts(vertices, w2cs, projs)
    # back-face culling (deferred path): FMHR_CULL=auto (default)
    # detects a safe sign from the start mesh — nonzero ONLY for closed
    # consistently-wound geometry, where dropping the back orientation is
    # exact (bit-identical winners; the reference's open MANO meshes
    # detect 0 and keep nvdiffrast's both-orientations semantics). ~33%
    # fewer pass-A (tile, chunk) pairs at prod geometry. "0" disables,
    # "1"/"-1" force a sign (A/B).
    cull_env = os.environ.get("FMHR_CULL", "auto")
    if cull_env == "auto":
        from ..raster.deferred import detect_cull_sign

        cull = detect_cull_sign(np.asarray(vertices), faces_np,
                                np.asarray(w2cs), np.asarray(projs))
    else:
        cull = int(cull_env)
    if cull:
        raster_kw["cull"] = cull
    # Cameras are optimization CONSTANTS here: the deferred backward then
    # accumulates ONE view-summed rest-space gradient table in-kernel
    # instead of [B, rec, Fpad] (the round-5 attribution put the XLA
    # view-sum reductions at ~22 ms/step standalone at prod). The mats
    # cotangent is zero by contract — nothing differentiates cameras.
    raster_kw["camera_grads"] = False
    _, rows_budget = audit_deferred_rows(clip0, faces_np, res, cull=cull)
    raster_kw["rows_budget"] = rows_budget
    # active-tile grid compaction: at a real capture's ~5-7% coverage
    # most (view, tile) kernel grid steps are background fixed overhead;
    # the audited tile list removes them exactly (bit-identical,
    # tests/test_deferred.py::test_tiles_budget_matches_dense).
    # FMHR_TILES_COMPACT=0 restores the dense grid for A/B.
    tiles_frac = 1.0
    if os.environ.get("FMHR_TILES_COMPACT", "1") != "0":
        from ..raster.deferred import dense_tile_count

        _, tiles_budget = audit_active_tiles(clip0, faces_np, res,
                                             cull=cull)
        raster_kw["tiles_budget"] = tiles_budget
        tiles_frac = tiles_budget / dense_tile_count(len(faces_np), res)
    # oversize-chunk (global-list) cap, audited like rows/tiles: the
    # full-res demo pipeline overflowed the fixed 64 default (r5)
    from ..raster.deferred import audit_global_chunks

    _, g_cap = audit_global_chunks(clip0, faces_np, res, cull=cull)
    raster_kw["global_cap"] = g_cap

    sh_coeffs, albedo, valid_masks = sh_init(
        grayimgs, imgs, masks, w2cs, projs, vertices, faces, topo_aa, cfg,
        raster_kw=raster_kw,
    )
    if os.environ.get("FMHR_HAM_SYNC"):
        # debug sync point: dispatch is async, so without this a device
        # fault in sh_init surfaces at the NEXT materialization (stage A)
        jax.block_until_ready((sh_coeffs, albedo, valid_masks))
        print("[ham] sh_init done", flush=True)
    delta0 = jnp.zeros_like(vertices)
    if warm_start:
        if warm_start.get("albedo") is not None:
            albedo = jnp.asarray(warm_start["albedo"], jnp.float32)
        if warm_start.get("sh_coeffs") is not None:
            ws_sh = jnp.asarray(warm_start["sh_coeffs"], jnp.float32)
            if ws_sh.shape == sh_coeffs.shape:
                sh_coeffs = ws_sh
        if warm_start.get("delta") is not None:
            delta0 = jnp.asarray(warm_start["delta"], jnp.float32)

    edge_mean = jnp.mean(edge_lengths_sq(vertices, faces))

    # ---------------- Stage A: albedo + SH ---------------------------------
    use_tiled = (cfg.tiled_loss is True or
                 (cfg.tiled_loss == "auto"
                  and jax.default_backend() != "cpu"))
    # Round 5: with the audited tile list available, run the training
    # loss on the COMPACT render layout — kernels write active-tile rows
    # and all downstream math (AA/shading/losses) scales with covered
    # tiles, not image area. Bit-identical to tiled
    # (tests/test_deferred.py::test_compact_layout_matches_tiled);
    # FMHR_LAYOUT=tiled restores the dense tiled layout for A/B.
    train_layout = "tiled"
    if (use_tiled and raster_kw.get("tiles_budget") is not None
            and os.environ.get("FMHR_LAYOUT", "compact") == "compact"):
        train_layout = "compact"
    if use_tiled:
        # tiled training layout (raster/deferred.py): targets are tiled
        # ONCE at setup; the per-step loss never leaves the kernels'
        # [B, T, C, P] layout (the untile + backward retile transposes
        # measured ~16 ms/step at production geometry). Loss values and
        # gradients are identical to the image-layout formulation.
        imgs_t = tile_images(imgs, res)            # [N, T, 3, P]
        masks_t = tile_images(masks, res)          # [N, T, P]
        valid_masks_t = tile_images(valid_masks, res)
    px_total = float(cfg.height * cfg.width)
    mb = resolve_view_microbatch(cfg.view_microbatch, cfg.batch,
                                 cfg.height, cfg.width,
                                 tile_active_frac=tiles_frac)

    def _masked_l1_t(pred, target, valid):
        # channel axis 2 ([B, T, C, P]); same value as _masked_l1
        num = jnp.sum(jnp.abs(pred - target) * valid[:, :, None])
        den = jnp.maximum(jnp.sum(valid) * pred.shape[2], 1.0)
        return num / den

    def stage_a_terms_tiled(albedo_p, sh_p, idx, data):
        """(num, den) of the pooled masked L1 over the views `idx`.

        `data` carries the image-sized tensors as jit ARGUMENTS — baking
        them into the program as closure constants overflows the remote
        compiler's request limit at full resolution (HTTP 413, 250+ MB
        of pixels; same reason as bench.py)."""
        normals = vertex_normals(vertices, faces, incidence=slot_inc)
        tr = render_scene(
            vertices, faces, w2cs[idx], projs[idx],
            jnp.concatenate([normals, albedo_p], -1),
            res, aa_topology=topo_aa, layout=train_layout, **raster_kw,
        )
        if train_layout == "compact":
            return stage_a_terms_compact(
                tr, data["imgs"][idx], data["masks"][idx], sh_p[idx],
                cfg.degree)
        feat, aa_w = tr["feat"], tr["aa"]
        pred_normals = safe_normalize(
            apply_antialias_tiled(feat[:, :, :3], aa_w), axis=2)
        rast_albedo = apply_antialias_tiled(feat[:, :, 3:6], aa_w)
        valid = ((data["masks"][idx] > 0) & (tr["ids"] > 0)).astype(jnp.float32)
        rad = sh_radiance(sh_p[idx][:, None, None, :], pred_normals,
                          cfg.degree, axis=2)
        pred = rad[:, :, None] * rast_albedo
        num = jnp.sum(jnp.abs(pred - data["imgs"][idx]) * valid[:, :, None])
        den = jnp.sum(valid) * 3.0
        return num, den

    def stage_a_terms(albedo_p, sh_p, idx, data):
        w2c, proj = w2cs[idx], projs[idx]
        normals = vertex_normals(vertices, faces, incidence=slot_inc)
        rast, feat, aa_w = render_scene(
            vertices, faces, w2c, proj,
            jnp.concatenate([normals, albedo_p], -1),
            res, aa_topology=topo_aa, **raster_kw,
        )
        pred_normals = safe_normalize(apply_antialias(feat[..., :3], aa_w))
        rast_albedo = apply_antialias(feat[..., 3:6], aa_w)
        valid = ((data["masks"][idx] > 0) & (rast[..., 3] > 0)).astype(jnp.float32)
        rad = sh_radiance(sh_p[idx][:, None, None, :], pred_normals, cfg.degree)
        pred = rad[..., None] * rast_albedo
        num = jnp.sum(jnp.abs(pred - data["imgs"][idx]) * valid[..., None])
        den = jnp.sum(valid) * 3.0
        return num, den

    terms_a = stage_a_terms_tiled if use_tiled else stage_a_terms
    batches_a, _ = _make_batcher(N, cfg.batch, cfg.epoch_albedo, cfg.seed)
    opt_a = optax.multi_transform(
        {"albedo": optax.adam(cfg.albedo_lr), "sh": optax.adam(cfg.sh_lr)},
        {"albedo": "albedo", "sh": "sh"},
    )

    # image-sized tensors travel as jit ARGUMENTS (HTTP-413 note above)
    if use_tiled:
        data_a = {"imgs": imgs_t, "masks": masks_t}
    else:
        data_a = {"imgs": imgs, "masks": masks}

    def make_run_stage_a(m: int):
        @jax.jit
        def run_stage_a(params, state, batches, data):
            def loss_fn(pp, idx):
                num, den = terms_a(pp["albedo"], pp["sh"], idx, data)
                return cfg.sfs_weight * num / jnp.maximum(den, 1.0)

            def step(carry, idx):
                p, s = carry
                if m >= cfg.batch:
                    loss, g = jax.value_and_grad(loss_fn)(p, idx)
                else:
                    # micro-batched: accumulate the num cotangent pull
                    # per chunk, normalize by the pooled den once
                    def body2(acc, idxm):
                        gn, num, den = acc
                        def f(pp):
                            num_c, den_c = terms_a(pp["albedo"], pp["sh"],
                                                   idxm, data)
                            return num_c, den_c
                        num_c, vjp_fn, den_c = jax.vjp(f, p, has_aux=True)
                        (gn_c,) = vjp_fn(jnp.ones_like(num_c))
                        add = lambda a, b: jax.tree.map(jnp.add, a, b)
                        return (add(gn, gn_c), num + num_c, den + den_c), None

                    zerosP = jax.tree.map(jnp.zeros_like, p)
                    (gn, num, den), _ = jax.lax.scan(
                        body2, (zerosP, jnp.zeros(()), jnp.zeros(())),
                        idx.reshape(-1, m))
                    D = jnp.maximum(den, 1.0)
                    loss = cfg.sfs_weight * num / D
                    g = jax.tree.map(lambda a: cfg.sfs_weight * a / D, gn)
                upd, s = opt_a.update(g, s)
                return (optax.apply_updates(p, upd), s), loss

            (p, s), losses = jax.lax.scan(step, (params, state), batches)
            return p, s, losses

        return run_stage_a

    # Stage A runs as host-synced SEGMENTS (like stage B): one device
    # execution is bounded to ~checkpoint_every epochs instead of the
    # whole 150-epoch scan — a multi-minute single execution is where
    # the tunneled backend's full-res runs died (round-4 logs), and
    # bounded segments are also the shape checkpointing needs.
    params_a = {"albedo": albedo, "sh": sh_coeffs}
    state_a = opt_a.init(params_a)
    total_a = batches_a.shape[0]
    seg_a = max(1, checkpoint_every * max(1, N // max(cfg.batch, 1)))
    _seg_cap = int(os.environ.get("FMHR_MAX_SEG_STEPS", "0"))
    if _seg_cap > 0:
        seg_a = max(1, min(seg_a, _seg_cap))
    m_a = mb
    runner_a = make_run_stage_a(m_a)
    losses_a_chunks = []
    ka = 0
    while ka < total_a:
        end = min(total_a, ka + seg_a)
        try:
            # reassign only after the host sync: an async-dispatch OOM
            # surfaces AT the sync, and the retry must re-run the
            # segment from the segment-start params, not half-applied
            # ones (pinned by test_ham_oom_fallback_halves_microbatch)
            new_params, new_state, losses_seg = runner_a(
                params_a, state_a, batches_a[ka:end], data_a)
            _sync(losses_seg)
            params_a, state_a = new_params, new_state
        except Exception as e:  # noqa: BLE001 — OOM fallback only
            if not _is_memory_error(e) or m_a <= 1:
                raise
            m_new = m_a // 2
            while cfg.batch % m_new:
                m_new -= 1
            import warnings

            warnings.warn(
                f"HAM stage A out of device memory at view microbatch "
                f"{m_a}; retrying with {m_new}.", stacklevel=2)
            m_a = m_new
            runner_a = make_run_stage_a(m_a)
            continue
        losses_a_chunks.append(losses_seg)
        ka = end
    albedo, sh_coeffs = params_a["albedo"], params_a["sh"]
    losses_a = (jnp.concatenate(losses_a_chunks)
                if losses_a_chunks else jnp.zeros((0,)))
    if os.environ.get("FMHR_HAM_SYNC"):
        print("[ham] stage A done", flush=True)

    # ---------------- Stage B: delta + albedo ------------------------------
    def _joint_laplacians(verts, albedo_p, albedo_w):
        """Both stage-B smoothing losses from ONE neighbor gather: the
        uniform Laplacian is linear per channel, so L[verts | albedo] ==
        [L verts | L albedo] exactly; the row norms are then taken per
        half. Halves the [V, D] gather traffic of the hot loop."""
        lv = uniform_laplacian(
            jnp.concatenate([verts, albedo_p], -1), edges, degrees,
            nbr_incidence=nbr_inc)
        V = verts.shape[0]

        def norm_mean(lap):
            row = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-20)
            return jnp.sum(row) / V

        return (cfg.lap_weight * norm_mean(lv[:, :3]),
                albedo_w * norm_mean(lv[:, 3:]))

    def stage_b_view_terms_tiled(delta_p, albedo_p, idx, data):
        """Per-view loss terms over the views `idx`: ((num, sse),
        (den, counters)) — the pooled photometric L1 numerator, the mask
        SSE, the gradient-free valid count x channels, and the capacity
        counters. The step combines them as sfs_w*num/den +
        mask_w*sse/(batch*H*W) (+ mesh terms), identically for the
        unchunked and micro-batched paths. `data` carries the image-sized
        tensors as jit arguments (HTTP-413 note in stage A)."""
        verts = vertices + delta_p
        normals = vertex_normals(verts, faces, incidence=slot_inc)
        tr = render_scene(
            verts, faces, w2cs[idx], projs[idx],
            jnp.concatenate(
                [normals, albedo_p, jnp.ones_like(verts[:, :1])], -1),
            res, aa_topology=topo_aa, layout=train_layout, **raster_kw,
        )
        if train_layout == "compact":
            vm = data["valid"][idx]
            num, sse, den = stage_b_terms_compact(
                tr, data["imgs"][idx], data["masks"][idx], vm,
                jnp.sum(vm ** 2), sh_coeffs[idx], cfg.degree)
            return (num, sse), (den, tr["counters"].sum(0))
        feat, aa_w = tr["feat"], tr["aa"]
        pred_normals = safe_normalize(feat[:, :, :3], axis=2)
        rast_albedo = feat[:, :, 3:6]
        # zero the right/bottom tile padding so the mask MSE matches the
        # image-layout mean exactly (pad pixels contribute (0-0)^2)
        pred_mask = (apply_antialias_tiled(feat[:, :, 6:7], aa_w)[:, :, 0]
                     * tr["grid"]["valid"])

        valid = ((data["masks"][idx] > 0) & (tr["ids"] > 0)).astype(jnp.float32)
        rad = sh_radiance(sh_coeffs[idx][:, None, None, :], pred_normals,
                          cfg.degree, axis=2)
        pred = rad[:, :, None] * rast_albedo
        tmp_img = jnp.where(valid[:, :, None] > 0, pred, 0.0)
        tmp_img = apply_antialias_tiled(tmp_img, aa_w)

        num = jnp.sum(jnp.abs(tmp_img - data["imgs"][idx]) * valid[:, :, None])
        den = jnp.sum(valid) * 3.0
        sse = jnp.sum((pred_mask - data["valid"][idx]) ** 2)
        return (num, sse), (den, tr["counters"].sum(0))

    def stage_b_view_terms(delta_p, albedo_p, idx, data):
        verts = vertices + delta_p
        w2c, proj = w2cs[idx], projs[idx]
        normals = vertex_normals(verts, faces, incidence=slot_inc)
        rast, feat, aa_w, counters = render_scene(
            verts, faces, w2c, proj,
            jnp.concatenate([normals, albedo_p, jnp.ones_like(verts[:, :1])], -1),
            res, aa_topology=topo_aa, with_counters=True, **raster_kw,
        )
        pred_normals = safe_normalize(feat[..., :3])
        rast_albedo = feat[..., 3:6]
        pred_mask = apply_antialias(feat[..., 6:7], aa_w)[..., 0]

        valid = ((data["masks"][idx] > 0) & (rast[..., 3] > 0)).astype(jnp.float32)
        rad = sh_radiance(sh_coeffs[idx][:, None, None, :], pred_normals, cfg.degree)
        pred = rad[..., None] * rast_albedo
        tmp_img = jnp.where(valid[..., None] > 0, pred, 0.0)
        tmp_img = apply_antialias(tmp_img, aa_w)

        num = jnp.sum(jnp.abs(tmp_img - data["imgs"][idx]) * valid[..., None])
        den = jnp.sum(valid) * 3.0
        sse = jnp.sum((pred_mask - data["valid"][idx]) ** 2)
        return (num, sse), (den, counters.sum(0))

    def stage_b_mesh_losses(delta_p, albedo_p, albedo_w):
        """View-independent regularizers (computed ONCE per step, outside
        the micro-batch scan): laplacian, albedo-laplacian, edge, delta."""
        verts = vertices + delta_p
        lap, alb = _joint_laplacians(verts, albedo_p, albedo_w)
        el = edge_lengths_sq(verts, faces)
        edge_l = cfg.edge_weight * jnp.mean(jnp.clip(el - edge_mean, 0.0, 1.0))
        delta_l = cfg.delta_weight * jnp.mean(jnp.sum(delta_p ** 2, -1))
        return lap + alb + edge_l + delta_l

    terms_b = stage_b_view_terms_tiled if use_tiled else stage_b_view_terms

    steps_b_total_epochs = cfg.epoch_sfs
    batches_b, steps_pe = _make_batcher(N, cfg.batch, steps_b_total_epochs, cfg.seed + 1)
    half_step = (steps_b_total_epochs // 2) * steps_pe
    opt_b = optax.multi_transform(
        {"delta": optax.adam(cfg.lr), "albedo": optax.adam(cfg.albedo_lr)},
        {"delta": "delta", "albedo": "albedo"},
    )

    def make_run_stage_b_segment(m: int):
        npx = cfg.batch * px_total

        @jax.jit
        def run_stage_b_segment(params, state, batch_seg, step_seg, data):
            def step(carry, xs):
                p, s = carry
                idx, i = xs
                albedo_w = jnp.where(
                    i >= half_step, cfg.albedo_weight / 10000.0,
                    cfg.albedo_weight)

                mesh_fn = lambda pp: stage_b_mesh_losses(
                    pp["delta"], pp["albedo"], albedo_w)
                view_fn = lambda pp, ix: terms_b(pp["delta"], pp["albedo"],
                                                 ix, data)
                mesh_loss, g_mesh = jax.value_and_grad(mesh_fn)(p)
                if m >= cfg.batch:
                    # single-chunk fast path: one fused value_and_grad of
                    # the COMBINED per-view loss (no accumulators)
                    def full_loss(pp):
                        (num, sse), (den, counters) = view_fn(pp, idx)
                        l = (cfg.sfs_weight * num / jnp.maximum(den, 1.0)
                             + cfg.mask_weight * sse / npx)
                        return l, counters

                    (vloss, counters), g_v = jax.value_and_grad(
                        full_loss, has_aux=True)(p)
                    loss = vloss + mesh_loss
                    g = jax.tree.map(jnp.add, g_v, g_mesh)
                else:
                    gn, gs, num, sse, den, counters = accumulate_view_grads(
                        p, idx, m, view_fn)
                    D = jnp.maximum(den, 1.0)
                    loss = (cfg.sfs_weight * num / D
                            + cfg.mask_weight * sse / npx + mesh_loss)
                    g = jax.tree.map(
                        lambda a, b, c: (cfg.sfs_weight * a / D
                                         + cfg.mask_weight * b / npx + c),
                        gn, gs, g_mesh)
                upd, s = opt_b.update(g, s)
                return (optax.apply_updates(p, upd), s), (loss, counters)

            (p, s), (losses, counters) = jax.lax.scan(
                step, (params, state), (batch_seg, step_seg))
            return p, s, losses, counters

        return run_stage_b_segment

    if use_tiled:
        data_b = {"imgs": imgs_t, "masks": masks_t, "valid": valid_masks_t}
    else:
        data_b = {"imgs": imgs, "masks": masks, "valid": valid_masks}
    params_b = {"delta": delta0, "albedo": albedo}
    state_b = opt_b.init(params_b)
    total_steps = batches_b.shape[0]
    seg_len = max(1, checkpoint_every * steps_pe)
    if _seg_cap > 0:
        seg_len = max(1, min(seg_len, _seg_cap))
    start_step = 0
    if checkpoint_dir is not None:
        from ..utils.checkpoint import latest_step, load_checkpoint

        last = latest_step(checkpoint_dir)
        if last is not None:
            params_b, state_b = load_checkpoint(
                checkpoint_dir, (params_b, state_b), last
            )
            start_step = last
    losses_chunks = []
    counters_chunks = []
    steps_all = jnp.arange(total_steps)
    k = start_step
    m_b = mb
    runner_b = make_run_stage_b_segment(m_b)
    while k < total_steps:
        end = min(total_steps, k + seg_len)
        try:
            # reassign after the sync — see the stage-A comment
            new_params, new_state, losses_seg, counters_seg = runner_b(
                params_b, state_b, batches_b[k:end], steps_all[k:end],
                data_b
            )
            _sync(losses_seg)
            params_b, state_b = new_params, new_state
        except Exception as e:  # noqa: BLE001 — OOM fallback only
            if not _is_memory_error(e) or m_b <= 1:
                raise
            m_new = m_b // 2
            while cfg.batch % m_new:
                m_new -= 1
            import warnings

            warnings.warn(
                f"HAM stage B out of device memory at view microbatch "
                f"{m_b}; retrying the segment with {m_new}.", stacklevel=2)
            m_b = m_new
            runner_b = make_run_stage_b_segment(m_b)
            continue
        losses_chunks.append(losses_seg)
        counters_chunks.append(counters_seg)
        k = end
        if checkpoint_dir is not None and k < total_steps:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, (params_b, state_b), k)
    delta, albedo = params_b["delta"], params_b["albedo"]
    losses_b = (jnp.concatenate(losses_chunks)
                if losses_chunks else jnp.zeros((0,)))
    overflow_b = (jnp.concatenate(counters_chunks)
                  if counters_chunks else jnp.zeros((0, 3), jnp.int32))
    total_overflow = np.asarray(overflow_b.sum(0)) if overflow_b.size else \
        np.zeros(3, np.int64)
    if total_overflow.any():
        import warnings

        warnings.warn(
            "HAM stage B rendered with capacity overflow: "
            f"{int(total_overflow[0])} (tile,chunk) pairs dropped past the "
            f"SMEM pair cap, {int(total_overflow[1])} winner-cap overflows "
            f"(raise HamConfig.winner_cap), and {int(total_overflow[2])} "
            "global-cap chunk drops across all steps — raise rows_budget/"
            "winner_cap or the tile size (FMHR_DEFERRED_TILE); affected "
            "pixels rendered incomplete.", stacklevel=2)

    return {
        "vertices": vertices + delta,
        "delta": delta,
        "albedo": albedo,
        "sh_coeffs": sh_coeffs,
        "valid_masks": valid_masks,
        "losses_albedo": losses_a,
        "losses_sfs": losses_b,
        "overflow_sfs": overflow_b,
        "topology": topo,
    }
