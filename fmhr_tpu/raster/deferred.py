"""Deferred-shading rasterization: the winning triangle's FULL record per
pixel from Pallas passes, with a matmul-reduction custom_vjp backward.

Why: the reference's hot loop (`/root/reference/mesh_sfs_optim.py:246-318`)
is rasterize -> interpolate -> antialias fwd+bwd over all pixels. The
round-1 TPU port paid ~10 ms per [B, H, W]-indexed XLA gather forward and
an XLA scatter-add transpose backward. This module removes both with a
three-stage design (pass A / compact / pass B):

- **Pass A (visibility)** streams a compact per-chunk COEFFICIENT table:
  for every 128-face chunk, XLA precomputes affine edge functions
  l_k(px, py) = A_k·px + B_k·py + C_k and the affine depth zw(px, py),
  anchored at the chunk's own screen position so the coefficients stay
  well-conditioned for subpixel triangles. The kernel evaluates the four
  affine forms for 128 faces x 1024 pixels with small-k MXU matmuls
  against a constant (col, row, 1) basis, then tracks the winner PER
  LANE (zbest/chunkbest [P, K]) — no cross-lane reduction and no record
  extraction in the hot loop. One argmin per tile at the end yields the
  winning face index per pixel (`slot`).
- **Compaction (XLA)**: two tiny sorts turn the slot map into per-tile
  lists of DISTINCT winning chunks (~half the binned chunks; zero for
  background tiles).
- **Pass B (extraction + shading)** visits only winning chunks: DMA the
  full record ([12 clip coords, id, 3 AA edge ids, 3xC attrs] per
  face), a one-hot MXU matmul lands the winner's record TRANSPOSED
  ([rec, P]), and the kernel finishes perspective-correct barycentrics
  + feature interpolation as ~40 cheap [1, P] row ops, emitting final
  per-pixel values (u, v, zw, corner screen coords for AA, features,
  ids/edge ids). Only the antialias pass (cross-pixel neighbors) stays
  in XLA; nothing pixel-sized is gathered and the raw-record tensor is
  never materialized.
- **Backward** is a HAND-WRITTEN VJP: per tile, the kernel re-extracts
  the winners' records, back-propagates the shading math on [1, P]
  rows (mirroring XLA autodiff of the same formulas, eps-gates
  included), and reduces the record gradients by one-hot matmuls
  accumulated (read-modify-write over the sequential grid) DIRECTLY
  into face-table layout [rec, F]. No scatter-adds and no segment
  reduction anywhere on the pixel-sized path; faces reduce to
  vertices/attributes by a STATIC vertex->(face, corner) incidence
  gather. Verified against XLA autodiff of the oracle path in
  tests/test_deferred.py::test_deferred_gradients_match_xla.

Binning happens at CHUNK granularity: tile t's work list is the set of
128-face chunks whose tile bbox touches t. Mesh face order is spatially
coherent (subdivision order), so this costs only ~1.4x the ideal record
count at production density.

Semantics match raster/api.py (nvdiffrast conventions: ids 1-based, 0 =
background, `rast = (u, v, z/w, id)`), verified against the naive oracle
in tests/test_deferred.py. The pass-A coverage test is the same
sign-of-edge-function rule evaluated in an algebraically identical but
floating-point-reassociated form; the chunk anchoring keeps the
reassociation noise ~4 orders of magnitude below the per-pixel edge
margin at production triangle density.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import W_EPS, AREA_EPS

# Pixel-tile shape (P = TILE_H*TILE_W pixels per kernel grid step). The
# per-chunk pair count scales like (bbox_x + TILE_W)(bbox_y + TILE_H);
# for the ~16px chunk footprints of production meshes a square 32x32
# tile yields ~16% fewer (tile, chunk) pairs than the VREG-shaped 8x128
# (measured via audit_deferred_rows at ih geometry). The kernels are
# shape-agnostic: pixels map to (row, col) by index arithmetic only.
#
# FMHR_DEFERRED_TILE=HxW overrides (import-time) for on-hardware A/B:
# pass-A [P, K] compute per pair scales with P while pair count grows
# only mildly as tiles shrink (measured at ih geometry: 16x32 = 1.11x
# pairs at 0.5x P -> 0.55x pass-A element work; 16x16 = 1.25x pairs at
# 0.25x P -> 0.31x), but each grid step also carries fixed scalar/DMA
# overhead (grid steps scale with tile count) that only a hardware
# trace can weigh. P must stay a multiple of 8 (sublane) and should be
# >= 256 to keep VREGs full.
_tile_env = os.environ.get("FMHR_DEFERRED_TILE")
if _tile_env:
    TILE_H, TILE_W = (int(v) for v in _tile_env.lower().split("x"))
else:
    # Default measured on v5e at the production preset (sort lists,
    # BASELINE.md round-3 A/B table): 8x32 = 96.7 ms/step vs 32x32 =
    # 128.3, 16x32 = 108.7, 8x64 = 103.2, 16x16 = 209 (scatter-era).
    # Small P wins because pass-A work is pairs*P while pairs grow only
    # mildly as tiles shrink. Full-resolution runs (1280x1024) override
    # to a larger tile via the env knob to keep the SMEM pair budget
    # under the cap.
    TILE_H, TILE_W = 8, 32
_PIX = TILE_H * TILE_W
# Pass-A coefficient-chunk prefetch pipeline depth (revolving VMEM
# slots + DMA semaphores; 16x128 f32 = 8KB per slot). Default 2 =
# classic double buffering (one outstanding prefetch); FMHR_PASSA_DEPTH
# raises it for on-hardware A/B — if the trace shows pass A bound by
# per-chunk DMA latency rather than VPU compute, a deeper pipeline
# hides it at negligible VMEM cost. Semantics identical at any depth.
_PASSA_DEPTH = max(2, int(os.environ.get("FMHR_PASSA_DEPTH", "2")))

# Winner-record extract pipeline depth (pass B + backward re-extract +
# the backward RMW staging). Measured FLAT on v5e at the prod preset
# (depth 2/4/6 -> 64.94/64.95/64.84 ms full step, round-5 A/B): the
# extract loop is NOT DMA-latency bound — the double-buffered prefetch
# already hides the 3-copy round trip behind the per-winner compute
# (one-hot + [rec, K]x[K, P] HIGHEST matmul + add). Default stays 2;
# the knob remains for A/B on other parts.
_EXTRACT_DEPTH = max(2, int(os.environ.get("FMHR_EXTRACT_DEPTH", "2")))

# Precision of the one-hot selection matmuls (winner extract + backward
# RMW distribution). HIGHEST (f32) needs ~6 bf16 MXU passes per matmul
# and a round-5 probe showed these matmuls dominate the winner loops
# (render fwd 28.4 -> 15.8 ms at bf16x1). Default is the exact 3-split:
# the f32 operand splits into hi/mid/lo bf16 terms (RN residuals; 24
# mantissa bits covered, the onehot side is exactly one bf16 term),
# M-stacked into ONE [3·rec, K] bf16 matmul — the selection reconstructs
# the f32 values BIT-EXACTLY (sums of non-overlapping 8-bit mantissa
# segments are exact in f32) at ~1/3 the MXU work of HIGHEST.
# FMHR_EXTRACT_PREC=highest restores the plain f32 matmul for A/B;
# =default is a perf PROBE only (bf16x1 quantizes the records).
_EXTRACT_MODE = os.environ.get("FMHR_EXTRACT_PREC", "split3")
_EXTRACT_PREC = (jax.lax.Precision.DEFAULT
                 if _EXTRACT_MODE == "default"
                 else jax.lax.Precision.HIGHEST)


def _split3(x):
    """Exact 3-way bf16 decomposition of f32: x == hi + mid + lo with
    each term bf16-representable (RN residual extraction; the final
    residual has <= 8 significant bits left)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    return hi, mid, lo


def _select_matmul(vals, onehot, dn_v, dn_o):
    """vals [rec, K-or-P] f32 selected/distributed by `onehot` via
    dot_general with dims (contracting over the axis given by dn_v/dn_o).
    split3 mode: one M-stacked bf16 matmul, bit-exact for selection."""
    rec = vals.shape[0]
    if _EXTRACT_MODE == "split3":
        stack = jnp.concatenate(_split3(vals), axis=0).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            stack, onehot.astype(jnp.bfloat16),
            dimension_numbers=(((dn_v,), (dn_o,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return (out[0:rec] + out[rec:2 * rec]) + out[2 * rec:3 * rec]
    return jax.lax.dot_general(
        vals, onehot,
        dimension_numbers=(((dn_v,), (dn_o,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_EXTRACT_PREC,
    )

_BIG = np.float32(3.0e38)
_NEG = np.float32(-1.0e30)  # invalid-face C0 marker (headroom vs bf16x6)
_INT_BIG = np.int32(1 << 30)
_CHUNK = 128  # faces per table chunk (lane dim)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def face_order_morton(clip0, faces, resolution):
    """Static face permutation by Morton code of the screen centroid.

    clip0: ONE representative view's concrete clip verts [V, 4] (e.g.
    from the setup-time audit render); faces [F, 3].

    MEASURED NEGATIVE at production density: Loop-subdivision order
    (contiguous 4^k child patches) bins TIGHTER than Morton or Hilbert
    centroid orders (16.0k vs 21.3k/21.0k pairs at ih geometry), so no
    caller applies this by default. Kept for non-subdivision meshes
    whose native face order is incoherent — pass the result as
    `face_order` to `render_pixels` / `DeferredTopology.build(order=)`;
    external face ids in `rast[..., 3]` are order-invariant.
    """
    H, W = resolution
    clip0 = np.asarray(clip0)
    faces = np.asarray(faces, np.int64)
    w = clip0[:, 3:4]
    w = np.where(np.abs(w) > W_EPS, w, W_EPS)
    x = (clip0[:, 0:1] / w + 1.0) * (W * 0.5)
    y = (clip0[:, 1:2] / w + 1.0) * (H * 0.5)
    cx = x[faces].mean(1)[:, 0]
    cy = y[faces].mean(1)[:, 0]
    qx = np.clip((cx / max(W, 1) * 1024), 0, 1023).astype(np.uint32)
    qy = np.clip((cy / max(H, 1) * 1024), 0, 1023).astype(np.uint32)

    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    code = (spread(qx) << 1) | spread(qy)
    return np.argsort(code, kind="stable").astype(np.int32)


@dataclasses.dataclass(frozen=True)
class DeferredTopology:
    """Host-side static topology for the deferred renderer.

    vert_incidence[v] lists the (face*3 + corner) slots that reference
    vertex v (sentinel 3*F for padding) -- the backward face->vertex
    reduction is a dense gather over this table instead of a scatter.

    With `order` (see `face_order_morton`), faces are stored permuted
    for tighter chunk bboxes; `ext_face_ids` keeps the EXTERNAL
    (original) 1-based ids so `rast[..., 3]` is order-invariant.
    """

    faces: np.ndarray          # [Fpad, 3] int32 (possibly permuted; padded
    #                            to a 128 multiple with degenerate 0,0,0)
    face_edge_ids: np.ndarray  # [Fpad, 3] int32 (k=0:(v0,v1), 1:(v1,v2), 2:(v2,v0))
    vert_incidence: np.ndarray  # [V, D] int32, sentinel = 3*Fpad
    num_vertices: int
    ext_face_ids: np.ndarray   # [Fpad] float32, original face id + 1 (0 pad)
    num_faces_real: int

    @classmethod
    def build(cls, faces, num_vertices: int,
              order=None) -> "DeferredTopology":
        faces = np.asarray(faces, np.int32)
        if order is not None:
            order = np.asarray(order, np.int32)
            faces = faces[order]
            ext_ids = (order + 1).astype(np.float32)
        else:
            ext_ids = np.arange(1, faces.shape[0] + 1, dtype=np.float32)
        F = faces.shape[0]
        V = int(num_vertices)
        # vertex -> (face, corner) incidence over the REAL faces only
        # (padded slots never carry gradient; including them would blow up
        # vertex 0's row width)
        flat = faces.reshape(-1)  # value = vertex id, index = face*3+corner
        inc_order = np.argsort(flat, kind="stable").astype(np.int32)
        sorted_v = flat[inc_order]
        counts = np.bincount(flat, minlength=V)
        D = max(1, int(counts.max()) if F else 1)
        # pad the face table to a whole number of 128-face chunks with
        # degenerate (0, 0, 0) faces: zero area -> never valid, never wins,
        # and the per-step XLA pad of every table disappears
        Fpad = _round_up(max(F, 1), _CHUNK)
        if Fpad > F:
            faces = np.concatenate(
                [faces, np.zeros((Fpad - F, 3), np.int32)])
            ext_ids = np.concatenate(
                [ext_ids, np.zeros(Fpad - F, np.float32)])
        inc = np.full((V, D), 3 * Fpad, np.int32)
        starts = np.concatenate([[0], np.cumsum(counts)])
        for_rows = np.repeat(np.arange(V), counts)
        col = np.arange(len(flat)) - starts[sorted_v]
        inc[for_rows, col] = inc_order
        # edge ids (same construction as antialias.AATopology) over the
        # padded table: the degenerate (0,0) edge only shifts the id
        # numbering uniformly; padded faces never reach a pixel
        e01 = np.sort(faces[:, [0, 1]], 1)
        e12 = np.sort(faces[:, [1, 2]], 1)
        e20 = np.sort(faces[:, [2, 0]], 1)
        all_e = np.concatenate([e01, e12, e20], 0).astype(np.int64)
        h = all_e[:, 0] * V + all_e[:, 1]
        _, inv = np.unique(h, return_inverse=True)
        eids = inv.reshape(3, Fpad).T.astype(np.int32)
        return cls(faces=faces, face_edge_ids=eids, vert_incidence=inc,
                   num_vertices=V, ext_face_ids=ext_ids,
                   num_faces_real=F)


def default_max_span(F: int, H: int, W: int) -> int:
    """Per-CHUNK tile-span cap: a 128-face chunk whose tile bbox covers
    more than this many tiles goes on the global (every-tile) list.
    Chunks of a spatially coherent mesh cover a small rectangle (measured
    ~6-12 tiles at production density); 32 keeps the per-tile lists
    lossless with headroom while bounding degenerate chunks."""
    del F, H, W
    return 32


def _plan(F, V, C, H, W, max_span, global_cap, pairs_budget=None,
          winner_cap=128, quiet=False, tiles_budget=None):
    """Static layout plan shared by the passes.

    The pass-A work lists are COMPACT (tile, chunk) pairs sorted by tile
    with per-tile [start, end) ranges; the chunk ids live in SMEM during
    the kernels. pairs_budget bounds the live pair count per view (probe
    it with `audit_deferred_rows`); if live pairs exceed the budget the
    highest-index tiles lose chunks — size with margin via the audit.
    global_cap bounds the per-view count of GLOBAL chunks (chunks whose
    tile span exceeds max_span; those are tested by every tile).
    winner_cap bounds DISTINCT winning chunks per tile for pass B; a
    tile that exceeds it renders its overflow pixels as background
    (fail-visible, not silently wrong — and ~8x headroom vs measured
    production tiles).
    tiles_budget (audit with `audit_active_tiles`) switches all three
    kernels to the ACTIVE-TILE grid: the grid's tile axis runs over a
    scalar-prefetched per-view list of tiles whose chunk bboxes are
    non-empty instead of all T tiles. At a real capture's ~5-7% frame
    coverage most (view, tile) grid steps are background whose only cost
    is the per-step grid/DMA fixed overhead — the compacted grid removes
    them exactly (bbox-inactive tiles are provably background). Active
    tiles beyond the budget are dropped (their pairs counted in counter
    col 0 — fail-visible, like pair_cap).
    """
    tiles_y = math.ceil(H / TILE_H)
    tiles_x = math.ceil(W / TILE_W)
    T = tiles_y * tiles_x
    # Record-row layout. Every DMA'd section must start and size at a
    # multiple of 8 sublanes (Mosaic memref-slice tiling rule; CPU
    # interpret mode does not enforce it): coords live in rows 0:16
    # (12 used), the static id/edge-id rows in 16:24 (4 used), and the
    # attribute rows from 24 (3C used, padded to `rec`).
    r_used = 24 + 3 * C
    rec = _round_up(r_used, 8)
    rec_a = 16                # 12 affine coefficient rows + pad (pass A)
    # pass-B shaded output rows: u v zw | sx0..2 sy0..2 | feat C |
    # id eids(3) wok
    rows_used = 14 + C
    rows_out = _round_up(rows_used, 8)
    nc = max(1, math.ceil(F / _CHUNK))
    Fpad = nc * _CHUNK
    lossless = min(nc * max_span, T * nc)
    cap = lossless if pairs_budget is None else min(lossless,
                                                   int(pairs_budget))
    # SMEM-resident pair list. Cap probed on v5e hardware (round 4): a
    # 512 KB SMEM input block compiles and runs, so 64 KB here is safe
    # with wide margin; the realistic-framing 1280x1024 demo needs
    # ~11.3k live pairs/view at the 8x32 tile. FMHR_PAIR_CAP overrides
    # for A/B.
    _cap_max = int(os.environ.get("FMHR_PAIR_CAP", "16384"))
    pair_cap = _round_up(min(max(cap, _CHUNK), _cap_max), _CHUNK)
    if pair_cap < cap and not quiet:
        import warnings
        if pairs_budget is not None:
            warnings.warn(
                f"deferred rasterizer: requested rows_budget {pairs_budget} "
                f"exceeds the {pair_cap} SMEM pair cap; views with more "
                "live (tile, chunk) pairs drop chunks from the highest-"
                "index tiles. Reduce faces-per-view, raise tile size, or "
                "split the view batch.", stacklevel=3)
        else:
            warnings.warn(
                f"deferred rasterizer: no rows_budget given and the "
                f"lossless bound ({cap} pairs) exceeds the {pair_cap} SMEM "
                "pair cap — views whose LIVE pairs exceed the cap silently "
                "drop chunks. Run raster.deferred.audit_deferred_rows on a "
                "representative view and pass rows_budget.", stacklevel=3)
    g_pad = _round_up(global_cap, 8)
    wcap = min(_round_up(winner_cap, 8), _round_up(nc, 8))
    ta_cap = None
    if tiles_budget is not None:
        ta_cap = int(min(max(int(tiles_budget), 1), T))
    return dict(tiles_y=tiles_y, tiles_x=tiles_x, T=T, r_used=r_used,
                rec=rec, rec_a=rec_a, nc=nc, Fpad=Fpad, pair_cap=pair_cap,
                g_cap=global_cap, g_pad=g_pad, wcap=wcap, ta_cap=ta_cap,
                rows_used=rows_used, rows_out=rows_out, H=H, W=W,
                Hp=tiles_y * TILE_H, Wp=tiles_x * TILE_W)


# --------------------------------------------------------------------------
# Per-view work-list build (pure XLA, non-differentiable structure)
# --------------------------------------------------------------------------

def _face_orient(sx, sy):
    """Signed double area of each projected face, [3, F] screen coords.

    Positive scalings map NDC to pixels, so the sign equals the
    pixel-space orientation `d` used by `_coeff_table`.
    """
    return ((sx[1] - sx[0]) * (sy[2] - sy[0])
            - (sx[2] - sx[0]) * (sy[1] - sy[0]))


def _tile_ranges_t(sx, sy, w, p, H, W, cull=0):
    """Per-face tile bbox from TRANSPOSED screen coords.

    sx/sy/w: [3, F] for one view. Same semantics as
    visibility._face_tile_ranges but without needing [F, 3, 4] tri.
    cull: 0 = keep both orientations; ±1 = drop faces whose signed
    screen area `d` has the opposite sign (see `detect_cull_sign`).
    """
    in_front = jnp.all(w > W_EPS, axis=0)
    if cull:
        in_front = in_front & (_face_orient(sx, sy) * cull > 0)
    x_pix = (sx + 1.0) * (W * 0.5)
    y_pix = (sy + 1.0) * (H * 0.5)
    xmin = jnp.clip(jnp.floor(jnp.min(x_pix, 0)), 0, W - 1)
    xmax = jnp.clip(jnp.ceil(jnp.max(x_pix, 0)), 0, W - 1)
    ymin = jnp.clip(jnp.floor(jnp.min(y_pix, 0)), 0, H - 1)
    ymax = jnp.clip(jnp.ceil(jnp.max(y_pix, 0)), 0, H - 1)
    offscreen = (
        (jnp.max(x_pix, 0) < 0) | (jnp.min(x_pix, 0) >= W)
        | (jnp.max(y_pix, 0) < 0) | (jnp.min(y_pix, 0) >= H)
    )
    valid = in_front & ~offscreen
    tx0 = (xmin // TILE_W).astype(jnp.int32)
    tx1 = (xmax // TILE_W).astype(jnp.int32)
    ty0 = (ymin // TILE_H).astype(jnp.int32)
    ty1 = (ymax // TILE_H).astype(jnp.int32)
    span_x = jnp.where(valid, tx1 - tx0 + 1, 0)
    span_y = jnp.where(valid, ty1 - ty0 + 1, 0)
    return tx0, ty0, span_x, span_y, valid


def _chunk_bboxes(sx, sy, w, p, H, W, cull=0):
    """Per-CHUNK tile bboxes from [3, F] screen coords.

    The mesh face order is spatially coherent (subdivision order), so a
    128-face chunk covers a small tile rectangle; binning whole chunks by
    that rectangle costs <1% extra (tile, chunk) pairs vs exact per-face
    dedup (measured at production density) and keeps the sort tiny
    (nc*max_span keys, ~12k at 98k faces vs ~400k per-face).

    Returns (ctx0, cty0, cspan_x, cspan_y, any_valid), all [nc].
    """
    F = sx.shape[1]
    nc = p["nc"]
    tx0, ty0, span_x, span_y, valid = _tile_ranges_t(sx, sy, w, p, H, W,
                                                     cull=cull)
    tx1 = tx0 + span_x - 1
    ty1 = ty0 + span_y - 1
    big = jnp.int32(1 << 20)
    pad = p["Fpad"] - F

    def chunk_reduce(a, fill, op):
        a = jnp.where(valid, a, fill)
        if pad:
            a = jnp.pad(a, (0, pad), constant_values=fill)
        return op(a.reshape(nc, _CHUNK), axis=1)

    ctx0 = chunk_reduce(tx0, big, jnp.min)
    cty0 = chunk_reduce(ty0, big, jnp.min)
    ctx1 = chunk_reduce(tx1, -1, jnp.max)
    cty1 = chunk_reduce(ty1, -1, jnp.max)
    any_valid = ctx1 >= ctx0
    cspan_x = jnp.where(any_valid, ctx1 - ctx0 + 1, 0)
    cspan_y = jnp.where(any_valid, cty1 - cty0 + 1, 0)
    return ctx0, cty0, cspan_x, cspan_y, any_valid


# Work-list build formulation: "scatter" (counting sort — dense cumsums
# + one unique-index scatter) or "sort" (key sort + searchsorted). Both
# are bit-identical (pinned by tests); the env switch exists because XLA
# TPU scatter-lowering speed is workload-dependent — A/B on hardware.
# Work-list build variant. "sort" (one lax.sort of tile*nc+chunk keys)
# measured 173.5 -> 128.3 ms/step vs the dense counting-sort "scatter"
# build at the production preset on v5e (round-3 A/B): XLA scatters and
# the dense [nc, T] indicator are the slow path on TPU, and get worse as
# tiles shrink (T grows). Both remain bit-identical
# (tests/test_deferred.py::test_build_lists_matches_sort).
_LISTS_MODE = os.environ.get("FMHR_DEFERRED_LISTS", "sort")


def _glob_lists(g_mask, p):
    """Returns (g_list, g_cnt clamped to g_cap, g_drop) where g_drop is
    the number of oversize (global) chunks dropped past global_cap —
    counted (ADVICE r3) so a capacity-degraded render can't report
    all-zero counters."""
    g_idx = jnp.nonzero(g_mask, size=p["g_cap"],
                        fill_value=0)[0].astype(jnp.int32)
    g_raw = jnp.sum(g_mask.astype(jnp.int32))
    g_cnt = jnp.minimum(g_raw, p["g_cap"])
    g_drop = (g_raw - g_cnt).astype(jnp.int32)
    g_list = jnp.pad(g_idx, (0, p["g_pad"] - p["g_cap"]))
    return g_list, g_cnt, g_drop


def _build_lists(sx, sy, w, p, *, H, W, max_span, cull=0):
    """One view's (tile, chunk) work lists from [3, F] screen coords.

    Returns (chunk_list [pair_cap] int32, starts [T], ends [T],
    g_list [g_pad] int32, g_cnt scalar int32, n_drop scalar int32 — the
    live (tile, chunk) pairs dropped because they exceeded pair_cap;
    nonzero means the highest-index tiles render incomplete geometry —
    and g_drop scalar int32, oversize chunks dropped past global_cap).

    Counting-sort formulation (default): a dense [nc, T] hit indicator
    gives each pair's position directly (per-tile offset from a cumsum
    over tiles + rank from a cumsum over chunks) and ONE unique-index
    scatter places the chunk ids — no O(nc·max_span · log) sort. At
    production geometry the indicator is ~140k int32 per view. Output is
    bit-identical to the sorted formulation (pairs grouped by tile,
    chunk-ascending within a tile, tail tiles dropped beyond pair_cap) —
    pinned by tests/test_deferred.py::test_build_lists_matches_sort.
    """
    T, nc = p["T"], p["nc"]
    S = max_span
    tiles_x = p["tiles_x"]
    cap = p["pair_cap"]
    ctx0, cty0, cspan_x, cspan_y, any_valid = _chunk_bboxes(
        sx, sy, w, p, H, W, cull=cull)
    n_tiles = cspan_x * cspan_y
    g_mask = any_valid & (n_tiles > S)   # oversize chunks: every tile
    emit = any_valid & ~g_mask

    if _LISTS_MODE == "sort":
        slots = jnp.arange(S, dtype=jnp.int32)
        dx = slots[None, :] % jnp.maximum(cspan_x, 1)[:, None]
        dy = slots[None, :] // jnp.maximum(cspan_x, 1)[:, None]
        live = emit[:, None] & (slots[None, :] < n_tiles[:, None])
        tile = (cty0[:, None] + dy) * tiles_x + (ctx0[:, None] + dx)
        chunk = jnp.arange(nc, dtype=jnp.int32)[:, None]
        dead = T * nc
        key = jax.lax.sort(
            jnp.where(live, tile * nc + chunk, dead).reshape(-1))[:cap]
        t_ar = jnp.arange(T, dtype=jnp.int32)
        tile_of = key // nc
        # rank-by-count instead of jnp.searchsorted: the [T, cap]
        # compare+reduce fuses into two VPU reduction loops, while
        # searchsorted lowers to a sequential lax.while binary search
        # (measured 2x 1.3 ms/step + 2x 1.3 ms of body gathers at the
        # production preset on v5e). Identical on sorted tile_of.
        starts = jnp.sum(tile_of[None, :] < t_ar[:, None], axis=1,
                         dtype=jnp.int32)
        ends = jnp.sum(tile_of[None, :] <= t_ar[:, None], axis=1,
                       dtype=jnp.int32)
        chunk_list = jnp.where(key < dead, key % nc, 0).astype(jnp.int32)
        g_list, g_cnt, g_drop = _glob_lists(g_mask, p)
        total = jnp.sum(jnp.where(emit, n_tiles, 0))
        n_drop = jnp.maximum(total - cap, 0).astype(jnp.int32)
        return chunk_list, starts, ends, g_list, g_cnt, n_drop, g_drop

    t_ar = jnp.arange(T, dtype=jnp.int32)
    tx = t_ar % tiles_x
    ty = t_ar // tiles_x
    hit = (
        emit[:, None]
        & (tx[None, :] >= ctx0[:, None])
        & (tx[None, :] < (ctx0 + cspan_x)[:, None])
        & (ty[None, :] >= cty0[:, None])
        & (ty[None, :] < (cty0 + cspan_y)[:, None])
    )                                                  # [nc, T]
    hit_i = hit.astype(jnp.int32)
    rank = jnp.cumsum(hit_i, axis=0) - hit_i           # exclusive, per tile
    count = hit_i.sum(axis=0)                          # [T]
    offs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(count)])  # [T+1]
    pos = offs[None, :T] + rank                        # [nc, T]
    # live pairs get unique positions; dead entries go out of bounds and
    # are DROPPED (no write at all), so the scatter is honestly unique
    pos = jnp.where(hit & (pos < cap), pos, cap + 1).reshape(-1)
    chunk = jnp.broadcast_to(
        jnp.arange(nc, dtype=jnp.int32)[:, None], (nc, T)).reshape(-1)
    chunk_list = jnp.zeros(cap, jnp.int32).at[pos].set(
        chunk, mode="drop", unique_indices=True)
    starts = jnp.minimum(offs[:T], cap)
    ends = jnp.minimum(offs[1:], cap)
    g_list, g_cnt, g_drop = _glob_lists(g_mask, p)
    n_drop = jnp.maximum(offs[T] - cap, 0).astype(jnp.int32)
    return chunk_list, starts, ends, g_list, g_cnt, n_drop, g_drop


def _coeff_table(coords_t, p, H, W, cull=0):
    """Pass-A affine coefficient table + per-chunk anchors for ONE view.

    coords_t: [12, F] transposed clip coords (x0 y0 z0 w0 x1 ... w2).
    Returns (table_a [16, Fpad] f32, anchors [2, nc] f32).

    Everything is in PIXEL units with a per-chunk anchor subtracted:
    l_k(px, py) = A_k·(px - ax) + B_k·(py - ay) + C_k where (px, py) is
    the pixel center in pixels and C_k = l_k at the anchor. The anchor
    keeps all products O(chunk extent)² so the edge-sign noise stays
    ~1e-4 px² vs ~0.1 px² per-pixel margins at subpixel face density.
    Row layout (sign-folded so covered ⟺ min(l) ≥ 0; invalid faces get
    C0 = NEG): [A0 B0 C0 0 A1 B1 C1 0 A2 B2 C2 0 Az Bz Cz 0]; zw at
    pixel = Az·(px-ax) + Bz·(py-ay) + Cz.
    """
    F = coords_t.shape[1]
    nc, Fpad = p["nc"], p["Fpad"]
    w = coords_t[9:12]                               # [3, F]
    iw = 1.0 / jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    sx = coords_t[0:3] * iw
    sy = coords_t[3:6] * iw
    zf = coords_t[6:9] * iw                          # z/w per corner
    x = (sx + 1.0) * (W * 0.5)                       # pixel units
    y = (sy + 1.0) * (H * 0.5)

    in_front = jnp.all(w > W_EPS, axis=0)
    offscreen = (
        (jnp.max(x, 0) < 0) | (jnp.min(x, 0) >= W)
        | (jnp.max(y, 0) < 0) | (jnp.min(y, 0) >= H)
    )
    valid = in_front & ~offscreen

    # per-chunk anchor: masked min of vertex-0 pixel coords
    pad = Fpad - F

    def chunk_min(a):
        a = jnp.where(valid, a, _BIG)
        if pad:
            a = jnp.pad(a, (0, pad), constant_values=_BIG)
        m = jnp.min(a.reshape(nc, _CHUNK), axis=1)
        return jnp.where(m < _BIG, m, 0.0)

    ax_c = chunk_min(x[0])                           # [nc]
    ay_c = chunk_min(y[0])
    ax = jnp.repeat(ax_c, _CHUNK)[:F]
    ay = jnp.repeat(ay_c, _CHUNK)[:F]

    X = x - ax[None]                                 # [3, F] anchored
    Y = y - ay[None]
    A0 = Y[1] - Y[2]
    B0 = X[2] - X[1]
    C0 = X[1] * Y[2] - X[2] * Y[1]
    A1 = Y[2] - Y[0]
    B1 = X[0] - X[2]
    C1 = X[2] * Y[0] - X[0] * Y[2]
    A2 = Y[0] - Y[1]
    B2 = X[1] - X[0]
    C2 = X[0] * Y[1] - X[1] * Y[0]
    d = (X[1] - X[0]) * (Y[2] - Y[0]) - (X[2] - X[0]) * (Y[1] - Y[0])
    s = jnp.where(d >= 0.0, 1.0, -1.0).astype(jnp.float32)
    sd = s * d
    # oracle guard |d_ndc| > AREA_EPS, rescaled to pixel² units
    area_eps_pix = np.float32(AREA_EPS * (W * 0.5) * (H * 0.5))
    valid = valid & (sd > area_eps_pix)
    if cull:
        # back-face culling: only the kept orientation may ever cover.
        # Exact (bit-identical winners) on closed consistently-wound
        # meshes — the nearest visible face is always front-facing.
        valid = valid & (s * cull > 0)

    A0, B0, C0 = s * A0, s * B0, s * C0
    A1, B1, C1 = s * A1, s * B1, s * C1
    A2, B2, C2 = s * A2, s * B2, s * C2
    inv_sd = 1.0 / jnp.where(sd > area_eps_pix, sd, 1.0)
    Az = (A0 * zf[0] + A1 * zf[1] + A2 * zf[2]) * inv_sd
    Bz = (B0 * zf[0] + B1 * zf[1] + B2 * zf[2]) * inv_sd
    Cz = (C0 * zf[0] + C1 * zf[1] + C2 * zf[2]) * inv_sd

    zero = jnp.zeros_like(C0)
    C0 = jnp.where(valid, C0, _NEG)
    # [A B C d] per group; d = l0+l1+l2 is pixel-independent (the A/B
    # sums telescope to zero), so the kernel derives l2 = d - l0 - l1
    # instead of evaluating a third affine form
    rows = [A0, B0, C0, sd, A1, B1, C1, zero,
            A2, B2, C2, zero, Az, Bz, Cz, zero]
    table_a = jnp.stack(rows)                        # [16, F]
    if pad:
        table_a = jnp.pad(table_a, ((0, 0), (0, pad)))
        # padded faces must never win: C0 = -NEG marker
        table_a = table_a.at[2, F:].set(_NEG)
    anchors = jnp.stack([ax_c, ay_c])                # [2, nc]
    return table_a, anchors


# --------------------------------------------------------------------------
# Pass A: per-pixel winning face index (z-only visibility)
# --------------------------------------------------------------------------

def _make_passa_kernel(p, compact=False):
    """[pixels, faces] = [1024, 128] block-vectorized visibility.

    Coefficient chunks arrive as [16, 128] VMEM blocks, grouped
    [A B C 0] x {l0, l1, l2, zw}. Per group the kernel evaluates
    A·col + B·row + C' with two broadcast FMAs, where C' folds the tile
    offset and chunk anchor (C + A·dx + B·dy, a [1, K] row op). Coverage
    + the per-lane winner update are ~7 more VPU ops; there is no
    cross-lane work until the final per-tile argmin.

    `compact`: the grid's second axis indexes a scalar-prefetched
    per-view ACTIVE-TILE list instead of all tiles; the real tile id
    comes from the list (padding entries point at the dummy tile T,
    whose meta row is zero -> the empty branch).
    """
    nc = p["nc"]
    tiles_x = p["tiles_x"]
    K = _CHUNK

    def kernel(*refs):
        # meta_ref [1,1,1,4] SMEM: start, end, g_count
        # list_ref [1, 1, pair_cap] SMEM int32; glob_ref [1, 1, g_pad] SMEM
        # anch_ref [1, 2, nc] SMEM f32: pixel-space chunk anchors
        # taba_hbm [B, 16, Fpad] f32 (ANY/HBM): chunk c = strided
        # [16, K] DMA at column c*K
        # slot_ref [1,1,P,1] VMEM int32 out: winning face index or -1
        # wlist_ref [1,1,1,wcap] VMEM int32 out: DISTINCT winning chunks
        # (pair-list order: main ascending, then globals; nc = empty)
        # wstat_ref [1,1,1,8] VMEM int32 out: lane 0 = winner count
        # (clamped to wcap), lane 1 = winner-cap overflow count
        if compact:
            (tlist_ref, meta_ref, list_ref, glob_ref, anch_ref, taba_hbm,
             slot_ref, wlist_ref, wstat_ref) = refs
        else:
            (meta_ref, list_ref, glob_ref, anch_ref, taba_hbm,
             slot_ref, wlist_ref, wstat_ref) = refs
        b = pl.program_id(0)
        if compact:
            t = tlist_ref[b, pl.program_id(1)]
        else:
            t = pl.program_id(1)
        ty = t // tiles_x
        tx = t % tiles_x
        pidx = jax.lax.broadcasted_iota(jnp.int32, (_PIX, 1), 0)
        col = jax.lax.rem(pidx, TILE_W).astype(jnp.float32)   # [P, 1]
        row = (pidx // TILE_W).astype(jnp.float32)            # [P, 1]
        colK = jnp.broadcast_to(col, (_PIX, K))
        rowK = jnp.broadcast_to(row, (_PIX, K))
        # pixel-center offset of this tile's (0,0) pixel, in pixels
        tx0 = (tx * TILE_W).astype(jnp.float32) + 0.5
        ty0 = (ty * TILE_H).astype(jnp.float32) + 0.5
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (_PIX, K), 1)

        start = meta_ref[0, 0, 0, 0]
        end = meta_ref[0, 0, 0, 1]
        gcnt = meta_ref[0, 0, 0, 2]
        n_main = end - start
        n_total = n_main + gcnt

        def chunk_of(ci):
            return jnp.where(ci < n_main, list_ref[0, 0, start + ci],
                             glob_ref[0, 0, jnp.maximum(ci - n_main, 0)])

        # Empty (background) tiles skip the whole body — the final
        # argmin/winner epilogue alone costs ~1 us/tile, and most tiles
        # of a real capture are background (~90% at the demo framing;
        # 98% at the legacy wide framing, where it WAS pass A's cost).
        @pl.when(n_total == 0)
        def _():
            slot_ref[0, 0] = jnp.full((_PIX, 1), -1, jnp.int32)
            wlist_ref[0, 0] = jnp.full((1, p["wcap"]), nc, jnp.int32)
            wstat_ref[0, 0] = jnp.zeros((1, 8), jnp.int32)

        def body(tri_buf, sems):
            slot_col, covered = _vis_tile(
                p, n_total, chunk_of, anch_ref, taba_hbm, b, tx0, ty0,
                colK, rowK, k_iota, tri_buf, sems)
            slot_ref[0, 0] = slot_col
            wl, cnt = _winner_compact(p, n_total, chunk_of, slot_col,
                                      covered)
            wlist_ref[0, 0] = wl
            st_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
            wstat_ref[0, 0] = jnp.where(
                st_iota == 0, jnp.minimum(cnt, p["wcap"]),
                jnp.where(st_iota == 1,
                          jnp.maximum(cnt - p["wcap"], 0), 0))

        @pl.when(n_total > 0)
        def _():
            pl.run_scoped(
                body,
                tri_buf=pltpu.VMEM((_PASSA_DEPTH, 16, K), jnp.float32),
                sems=pltpu.SemaphoreType.DMA((_PASSA_DEPTH,)),
            )

    return kernel


def _vis_tile(p, n_total, chunk_of, anch_ref, taba_hbm, b, tx0, ty0,
              colK, rowK, k_iota, tri_buf, sems):
    """One tile's z-only visibility loop (the pass-A hot loop).

    Returns (slot_col [P, 1] int32 with -1 background, covered [P, 1]
    bool). Shared by the pass-A kernel and the fused A+B kernel.
    """
    K = _CHUNK

    def dma(slot_i, ci):
        k0 = pl.multiple_of(chunk_of(ci) * K, K)
        return pltpu.make_async_copy(
            taba_hbm.at[b, :, pl.ds(k0, K)],
            tri_buf.at[slot_i],
            sems.at[slot_i],
        )

    # warm the pipeline DEPTH-1 chunks ahead: with avg ~6 chunks
    # per (view, tile) pair list, a single outstanding prefetch
    # leaves the VPU exposed to HBM latency on every iteration if
    # the per-chunk compute is shorter than the DMA round-trip
    for i in range(_PASSA_DEPTH - 1):
        @pl.when(i < n_total)
        def _(i=i):
            dma(i, i).start()

    def loop(ci, carry):
        zb, cb = carry
        sl = jax.lax.rem(ci, _PASSA_DEPTH)

        @pl.when(ci + _PASSA_DEPTH - 1 < n_total)
        def _():
            dma(jax.lax.rem(ci + _PASSA_DEPTH - 1, _PASSA_DEPTH),
                ci + _PASSA_DEPTH - 1).start()

        dma(sl, ci).wait()
        ta = tri_buf[sl]                     # [16, K]
        c = chunk_of(ci)
        dxs = tx0 - anch_ref[0, 0, c]        # scalar f32
        dys = ty0 - anch_ref[0, 1, c]

        def grp(g):
            # A·(px-ax) + B·(py-ay) + C with the tile offset and
            # anchor folded into the [1, K] constant term; the
            # [P, K] part is two broadcast FMAs on the VPU (an
            # MXU small-k dot was 2x slower: 6 HIGHEST passes of
            # a k=4 matmul are pure launch overhead).
            blk = ta[4 * g:4 * g + 4]        # [4, K]: A B C d
            A = blk[0:1]
            Bq = blk[1:2]
            Cb = blk[2:3] + A * dxs + Bq * dys       # [1, K]
            return colK * A + (rowK * Bq + Cb)       # [P, K]

        l0 = grp(0)
        l1 = grp(1)
        l2 = (ta[3:4] - l0) - l1             # d - l0 - l1
        zw = grp(3)
        m = jnp.minimum(jnp.minimum(l0, l1), l2)
        zsel = jnp.where(m >= 0.0, zw, _BIG)
        better = zsel < zb
        zb = jnp.where(better, zsel, zb)
        cb = jnp.where(better, c, cb)
        return zb, cb

    init = (
        jnp.full((_PIX, K), _BIG, jnp.float32),
        jnp.zeros((_PIX, K), jnp.int32),
    )
    zb, cb = jax.lax.fori_loop(0, n_total, loop, init)
    zmin = jnp.min(zb, axis=1, keepdims=True)        # [P, 1]
    cand = jnp.where(zb <= zmin, cb * K + k_iota, _INT_BIG)
    slot = jnp.min(cand, axis=1, keepdims=True)      # [P, 1]
    covered = zmin < _BIG
    return jnp.where(covered, slot, -1), covered


def _winner_compact(p, n_total, chunk_of, slot_col, covered, wsc=None):
    """In-kernel winner compaction: one short replay of the pair list
    against the final slot map replaces the XLA sort/scatter compaction
    stage (was ~20-30% of the whole fwd+bwd step at production
    geometry). DISTINCT because the pair list itself is duplicate-free
    per tile. Returns (wl [1, wcap] int32 vector with nc sentinels,
    cnt); with `wsc` (an SMEM (1, wcap) scratch) the winning chunk ids
    are ALSO stored as scalars for an in-kernel extraction loop (the
    fused A+B kernel).

    Degraded-mode retention policy (ADVICE r3): on winner-cap
    overflow the FIRST wcap chunks in pair-list order (main
    list ascending, then globals) are kept; the replaced XLA
    `_winner_lists` kept the lowest-NUMBERED chunks instead.
    Either way overflow pixels render as background and the
    overflow is counted in wstat lane 1 — the policy only
    affects WHICH pixels degrade, pinned by
    tests/test_deferred.py::test_winner_cap_overflow_retention.
    """
    K = _CHUNK
    nc = p["nc"]
    wcap = p["wcap"]
    cw = jnp.where(covered, jax.lax.div(slot_col, K), -1)  # [P, 1]
    wiota = jax.lax.broadcasted_iota(jnp.int32, (1, wcap), 1)

    def wloop(ci, carry):
        wl, cnt = carry
        c = chunk_of(ci)
        win = jnp.sum((cw == c).astype(jnp.int32)) > 0
        keep = win & (cnt < wcap)
        wl = jnp.where(keep & (wiota == cnt), c, wl)
        if wsc is not None:
            @pl.when(keep)
            def _():
                wsc[0, cnt] = c
        return wl, cnt + win.astype(jnp.int32)

    return jax.lax.fori_loop(
        0, n_total, wloop,
        (jnp.full((1, wcap), nc, jnp.int32), jnp.int32(0)))


def _winner_lists(slot, p):
    """Distinct winning chunks per tile from the slot map (pure XLA).

    slot: [B, T, P] int32 (face index or -1). Returns
    (wlist [B, T, wcap] int32, wcnt [B, T] int32). Tiles with more than
    wcap distinct winning chunks keep the lowest-numbered wcap; pass B
    renders the overflow pixels as background (audited in tests).

    Counting-sort formulation (no per-tile sorts of the P axis): one
    presence scatter into [B, T, nc], a cumsum over nc for the ascending
    rank, and one scatter into the list. Bit-identical to the original
    double-sort (tests/test_deferred.py::test_winner_lists_matches_sort).
    """
    nc, wcap = p["nc"], p["wcap"]
    B, T, P = slot.shape
    c = jnp.where(slot >= 0, slot // _CHUNK, nc)           # [B, T, P]
    if _LISTS_MODE == "sort":
        s = jnp.sort(c, axis=-1)
        first = jnp.concatenate(
            [jnp.ones(s.shape[:-1] + (1,), bool),
             s[..., 1:] != s[..., :-1]], axis=-1) & (s < nc)
        keys = jnp.where(first, s, nc)
        wlist = jnp.sort(keys, axis=-1)[..., :wcap].astype(jnp.int32)
        wcnt = jnp.minimum(jnp.sum(first, axis=-1), wcap).astype(jnp.int32)
        return wlist, wcnt
    b_i = jax.lax.broadcasted_iota(jnp.int32, (B, T, P), 0)
    t_i = jax.lax.broadcasted_iota(jnp.int32, (B, T, P), 1)
    present = jnp.zeros((B, T, nc + 1), jnp.bool_).at[b_i, t_i, c].set(True)
    present = present[..., :nc]                            # [B, T, nc]
    pi = present.astype(jnp.int32)
    rank = jnp.cumsum(pi, axis=-1) - pi                    # ascending
    wcnt = jnp.minimum(pi.sum(-1), wcap).astype(jnp.int32)
    # absent/overflow entries scatter out of bounds and are dropped
    pos = jnp.where(present & (rank < wcap), rank, wcap + 1)
    bb = jax.lax.broadcasted_iota(jnp.int32, (B, T, nc), 0)
    tt = jax.lax.broadcasted_iota(jnp.int32, (B, T, nc), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (B, T, nc), 2)
    wlist = jnp.full((B, T, wcap), nc, jnp.int32)
    wlist = wlist.at[bb, tt, pos].set(cc, mode="drop",
                                      unique_indices=True)
    return wlist, wcnt


# --------------------------------------------------------------------------
# Pass B: winner record extraction + in-kernel interpolation
# --------------------------------------------------------------------------

def _pix_ndc(p, t):
    """Pixel-center NDC coords of tile t as ([1, P] px, [1, P] py).

    Bit-matches geometry.pixel_ndc: (i + 0.5) * (2/W) - 1.
    """
    tiles_x = p["tiles_x"]
    H, W = p["H"], p["W"]
    ty = t // tiles_x
    tx = t % tiles_x
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, _PIX), 1)
    col = (jax.lax.rem(pidx, TILE_W) + tx * TILE_W).astype(jnp.float32)
    row = (pidx // TILE_W + ty * TILE_H).astype(jnp.float32)
    px = (col + 0.5) * np.float32(2.0 / W) - 1.0
    py = (row + 0.5) * np.float32(2.0 / H) - 1.0
    return px, py


def _shade_rows(recm, px, py, C):
    """Forward shading math on [*, P] row slabs of the extracted records.

    Formulas bit-match api.barycentrics_from_context + the interpolation
    in the XLA render path (same safe-eps rules), so the deferred path
    stays allclose to the naive oracle. Returns a dict of intermediates
    (the VJP recomputes through this).
    """
    x = [recm[k:k + 1] for k in range(0, 3)]
    y = [recm[k:k + 1] for k in range(3, 6)]
    z = [recm[k:k + 1] for k in range(6, 9)]
    w = [recm[k:k + 1] for k in range(9, 12)]
    w_in = [jnp.abs(wk) > W_EPS for wk in w]
    iw = [1.0 / jnp.where(ok, wk, W_EPS) for ok, wk in zip(w_in, w)]
    sx = [xk * iwk for xk, iwk in zip(x, iw)]
    sy = [yk * iwk for yk, iwk in zip(y, iw)]
    zf = [zk * iwk for zk, iwk in zip(z, iw)]
    d = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sx[2] - sx[0]) * (sy[1] - sy[0])
    d_ok = jnp.abs(d) > AREA_EPS
    safe_d = jnp.where(d_ok, d, AREA_EPS)
    n0 = (sx[1] - px) * (sy[2] - py) - (sx[2] - px) * (sy[1] - py)
    n1 = (sx[2] - px) * (sy[0] - py) - (sx[0] - px) * (sy[2] - py)
    l0 = n0 / safe_d
    l1 = n1 / safe_d
    l2 = 1.0 - l0 - l1
    lw = [l0 * iw[0], l1 * iw[1], l2 * iw[2]]
    den = lw[0] + lw[1] + lw[2]
    den_ok = jnp.abs(den) > W_EPS
    safe_den = jnp.where(den_ok, den, W_EPS)
    u = lw[0] / safe_den
    v = lw[1] / safe_den
    zw = l0 * zf[0] + l1 * zf[1] + l2 * zf[2]
    idf = recm[16:17]
    m = idf > 0.5
    a0 = recm[24:24 + C]
    a1 = recm[24 + C:24 + 2 * C]
    a2 = recm[24 + 2 * C:24 + 3 * C]
    feat = u * a0 + v * a1 + (1.0 - u - v) * a2          # [C, P]
    wokf = ((w[0] > 0) & (w[1] > 0) & (w[2] > 0)).astype(jnp.float32)
    return dict(x=x, y=y, z=z, w=w, w_in=w_in, iw=iw, sx=sx, sy=sy,
                zf=zf, d=d, d_ok=d_ok, safe_d=safe_d, l=[l0, l1, l2],
                lw=lw, den_ok=den_ok, safe_den=safe_den, u=u, v=v,
                zw=zw, idf=idf, m=m, a=[a0, a1, a2], feat=feat,
                wokf=wokf)


def _extract_loop(p, b, bs, wcnt, chunk_at, slot_col, dyn_hbm, ids_hbm,
                  sta_hbm, tri_buf, sems):
    """Accumulate the winners' [rec, P] record slab over winning chunks
    (one-hot MXU matmul per chunk, double-buffered triple of DMAs).

    `chunk_at(ci)` returns the ci-th winning chunk id (a scalar read
    from the winner-list SMEM input in pass B/bwd, or from the fused
    kernel's SMEM winner scratch).

    The record table is split three ways: dyn_hbm [B, 16, Fpad] carries
    the per-view coord rows (12 used), ids_hbm [1, 8, Fpad] the STATIC
    id/edge-id rows (4 used; one copy, a jit constant), sta_hbm
    [B_s, rec-24, Fpad] the
    attribute rows (B_s = 1 when attributes are shared across views —
    the common case — so no per-view broadcast is ever materialized).
    """
    rec = p["rec"]
    K = _CHUNK
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (_PIX, K), 1)

    def dmas(slot_i, ci):
        # all three sections are 8-sublane aligned in offset AND size
        # (dyn 16 rows / ids 8 rows / attrs rec-24 rows)
        k0 = pl.multiple_of(chunk_at(ci) * K, K)
        return (
            pltpu.make_async_copy(
                dyn_hbm.at[b, :, pl.ds(k0, K)],
                tri_buf.at[slot_i, 0:16], sems.at[slot_i, 0]),
            pltpu.make_async_copy(
                ids_hbm.at[0, :, pl.ds(k0, K)],
                tri_buf.at[slot_i, 16:24], sems.at[slot_i, 1]),
            pltpu.make_async_copy(
                sta_hbm.at[bs, :, pl.ds(k0, K)],
                tri_buf.at[slot_i, 24:rec], sems.at[slot_i, 2]),
        )

    D = _EXTRACT_DEPTH
    for i in range(D - 1):
        @pl.when(i < wcnt)
        def _(i=i):
            for d in dmas(i, i):
                d.start()

    def loop(ci, recm):
        sl = jax.lax.rem(ci, D)

        @pl.when(ci + D - 1 < wcnt)
        def _():
            for d in dmas(jax.lax.rem(ci + D - 1, D), ci + D - 1):
                d.start()

        for d in dmas(sl, ci):
            d.wait()
        c = chunk_at(ci)
        onehot = (slot_col - c * K == k_iota).astype(jnp.float32)
        # HIGHEST: bf16 would round face/edge ids > 256 to even and
        # quantize coords
        recm = recm + _select_matmul(tri_buf[sl], onehot, 1, 1)  # [rec, P]
        return recm

    return jax.lax.fori_loop(
        0, wcnt, loop, jnp.zeros((p["rec"], _PIX), jnp.float32))


def _make_passb_kernel(p, C, compact=False, save_recm=False):
    """Per-tile extraction + barycentrics + interpolation over DISTINCT
    winning chunks only.

    The one-hot matmul lands TRANSPOSED ([rec, P]): every per-pixel
    quantity is then a [1, P] row op on the VPU (8 vregs each), so the
    whole interpolation adds ~40 cheap row ops per tile instead of
    pixel-sized XLA tensors downstream. Output rows (`rows_used`):
    u v zw | sx0 sx1 sx2 sy0 sy1 sy2 | feat[C] | id eid0 eid1 eid2 wok.
    Background tiles (wcnt = 0) cost nothing.

    `compact`: active-tile grid (see `_make_passa_kernel`); the
    zero-filled pix buffer arrives aliased so never-visited (inactive)
    tiles read as background downstream.

    `save_recm` (compact_out training path): additionally store the
    extracted [rec, P] record slab per active tile — the backward kernel
    then reads it back as ONE block instead of re-running the whole
    per-winner extract loop (3 DMAs + one-hot matmul per winner chunk).
    Tiles with wcnt == 0 skip the write; the backward skips them too, so
    the garbage rows are never read.
    """

    def kernel(*refs):
        # wmeta [1,1,1,4] SMEM: wcnt; wlist [1,1,1,wcap] SMEM int32
        # slot_ref [1,1,P,1] VMEM int32
        # dyn_hbm [B, 16, Fpad] / ids_hbm [1, 8, Fpad] /
        # sta_hbm [B_s, rec-24, Fpad] ANY
        # pix_ref [1,1,rows_out,P] VMEM f32
        # [save_recm] recm_ref [1,1,rec,P] VMEM f32
        recm_ref = None
        if compact:
            if save_recm:
                (tlist_ref, wmeta_ref, wlist_ref, slot_ref, dyn_hbm,
                 ids_hbm, sta_hbm, init_ref, pix_ref, recm_ref) = refs
            else:
                (tlist_ref, wmeta_ref, wlist_ref, slot_ref, dyn_hbm,
                 ids_hbm, sta_hbm, init_ref, pix_ref) = refs
            del init_ref          # aliased zero fill of pix (ANY space)
        else:
            (wmeta_ref, wlist_ref, slot_ref, dyn_hbm, ids_hbm,
             sta_hbm, pix_ref) = refs
        b = pl.program_id(0)
        if compact:
            t = tlist_ref[b, pl.program_id(1)]
        else:
            t = pl.program_id(1)
        bs = jnp.minimum(b, sta_hbm.shape[0] - 1)
        wcnt = wmeta_ref[0, 0, 0, 0]
        slot_col = slot_ref[0, 0]                    # [P, 1]

        # background tiles: zero output rows, skip the ~40-row-op
        # shading math (the per-tile fixed cost of this pass)
        @pl.when(wcnt == 0)
        def _():
            zero = jnp.zeros((1, _PIX), jnp.float32)
            for r in range(p["rows_out"]):
                pix_ref[0, 0, r:r + 1] = zero

        def body(tri_buf, sems):
            recm = _extract_loop(p, b, bs, wcnt,
                                 lambda ci: wlist_ref[0, 0, 0, ci],
                                 slot_col, dyn_hbm, ids_hbm, sta_hbm,
                                 tri_buf, sems)
            if recm_ref is not None:
                recm_ref[0, 0] = recm
            _shade_write(p, C, recm, t, pix_ref)

        @pl.when(wcnt > 0)
        def _():
            pl.run_scoped(
                body,
                tri_buf=pltpu.VMEM((_EXTRACT_DEPTH, p["rec"], _CHUNK),
                                   jnp.float32),
                sems=pltpu.SemaphoreType.DMA((_EXTRACT_DEPTH, 3)),
            )

    return kernel


def _shade_write(p, C, recm, t, pix_ref):
    """Pass-B epilogue: shade the extracted records and store the
    output rows (shared by the pass-B and fused A+B kernels)."""
    px, py = _pix_ndc(p, t)
    f = _shade_rows(recm, px, py, C)
    m = f["m"]
    zero = jnp.zeros((1, _PIX), jnp.float32)
    pix_ref[0, 0, 0:1] = jnp.where(m, f["u"], zero)
    pix_ref[0, 0, 1:2] = jnp.where(m, f["v"], zero)
    pix_ref[0, 0, 2:3] = jnp.where(m, f["zw"], zero)
    for k in range(3):
        pix_ref[0, 0, 3 + k:4 + k] = f["sx"][k]
        pix_ref[0, 0, 6 + k:7 + k] = f["sy"][k]
    # single-row stores only: multi-row ref stores at unaligned
    # sublane offsets are rejected by Mosaic
    featm = jnp.where(m, f["feat"], jnp.zeros((C, _PIX), jnp.float32))
    for c in range(C):
        pix_ref[0, 0, 9 + c:10 + c] = featm[c:c + 1]
    pix_ref[0, 0, 9 + C:10 + C] = f["idf"]
    for k in range(3):                           # eids
        pix_ref[0, 0, 10 + C + k:11 + C + k] = recm[17 + k:18 + k]
    pix_ref[0, 0, 13 + C:14 + C] = f["wokf"]
    rows_used, rows_out = p["rows_used"], p["rows_out"]
    for r in range(rows_used, rows_out):
        pix_ref[0, 0, r:r + 1] = zero


def _make_fused_kernel(p, C, compact=False):
    """Fused pass A + pass B: one grid step per (view, tile) does
    visibility, in-kernel winner compaction, record extraction, and
    shading — one set of per-step grid/DMA fixed costs instead of two,
    and the slot map / winner list never round-trip to HBM between the
    passes (they are still written as outputs for the BACKWARD kernel,
    which re-extracts winners from them). The winning chunk ids are
    staged in an SMEM scratch by the compaction loop so the extraction
    DMAs can read them as scalars.
    """
    nc = p["nc"]
    tiles_x = p["tiles_x"]
    K = _CHUNK
    rows_out = p["rows_out"]
    wcap = p["wcap"]

    def kernel(*refs):
        if compact:
            (tlist_ref, meta_ref, list_ref, glob_ref, anch_ref, taba_hbm,
             dyn_hbm, ids_hbm, sta_hbm, init_ref,
             slot_ref, wlist_ref, wstat_ref, pix_ref) = refs
            del init_ref          # aliased zero fill of pix (ANY space)
        else:
            (meta_ref, list_ref, glob_ref, anch_ref, taba_hbm,
             dyn_hbm, ids_hbm, sta_hbm,
             slot_ref, wlist_ref, wstat_ref, pix_ref) = refs
        b = pl.program_id(0)
        if compact:
            t = tlist_ref[b, pl.program_id(1)]
        else:
            t = pl.program_id(1)
        ty = t // tiles_x
        tx = t % tiles_x
        bs = jnp.minimum(b, sta_hbm.shape[0] - 1)
        pidx = jax.lax.broadcasted_iota(jnp.int32, (_PIX, 1), 0)
        col = jax.lax.rem(pidx, TILE_W).astype(jnp.float32)
        row = (pidx // TILE_W).astype(jnp.float32)
        colK = jnp.broadcast_to(col, (_PIX, K))
        rowK = jnp.broadcast_to(row, (_PIX, K))
        tx0 = (tx * TILE_W).astype(jnp.float32) + 0.5
        ty0 = (ty * TILE_H).astype(jnp.float32) + 0.5
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (_PIX, K), 1)

        start = meta_ref[0, 0, 0, 0]
        end = meta_ref[0, 0, 0, 1]
        gcnt = meta_ref[0, 0, 0, 2]
        n_main = end - start
        n_total = n_main + gcnt

        def chunk_of(ci):
            return jnp.where(ci < n_main, list_ref[0, 0, start + ci],
                             glob_ref[0, 0, jnp.maximum(ci - n_main, 0)])

        zero = jnp.zeros((1, _PIX), jnp.float32)

        @pl.when(n_total == 0)
        def _():
            slot_ref[0, 0] = jnp.full((_PIX, 1), -1, jnp.int32)
            wlist_ref[0, 0] = jnp.full((1, wcap), nc, jnp.int32)
            wstat_ref[0, 0] = jnp.zeros((1, 8), jnp.int32)
            for r in range(rows_out):
                pix_ref[0, 0, r:r + 1] = zero

        def body(tri_a, sems_a, tri_b, sems_b, wsc):
            slot_col, covered = _vis_tile(
                p, n_total, chunk_of, anch_ref, taba_hbm, b, tx0, ty0,
                colK, rowK, k_iota, tri_a, sems_a)
            slot_ref[0, 0] = slot_col
            wl, cnt = _winner_compact(p, n_total, chunk_of, slot_col,
                                      covered, wsc=wsc)
            wlist_ref[0, 0] = wl
            st_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
            wstat_ref[0, 0] = jnp.where(
                st_iota == 0, jnp.minimum(cnt, wcap),
                jnp.where(st_iota == 1, jnp.maximum(cnt - wcap, 0), 0))
            wcnt = jnp.minimum(cnt, wcap)

            @pl.when(wcnt == 0)
            def _():
                for r in range(rows_out):
                    pix_ref[0, 0, r:r + 1] = zero

            @pl.when(wcnt > 0)
            def _():
                recm = _extract_loop(p, b, bs, wcnt,
                                     lambda ci: wsc[0, ci],
                                     slot_col, dyn_hbm, ids_hbm, sta_hbm,
                                     tri_b, sems_b)
                _shade_write(p, C, recm, t, pix_ref)

        @pl.when(n_total > 0)
        def _():
            pl.run_scoped(
                body,
                tri_a=pltpu.VMEM((_PASSA_DEPTH, 16, K), jnp.float32),
                sems_a=pltpu.SemaphoreType.DMA((_PASSA_DEPTH,)),
                tri_b=pltpu.VMEM((_EXTRACT_DEPTH, p["rec"], K),
                                 jnp.float32),
                sems_b=pltpu.SemaphoreType.DMA((_EXTRACT_DEPTH, 3)),
                wsc=pltpu.SMEM((1, wcap), jnp.int32),
            )

    return kernel


# --------------------------------------------------------------------------
# Backward kernel (hand-written VJP of _shade_rows + face-table reduction)
# --------------------------------------------------------------------------

def _shade_vjp(recm, g, px, py, C):
    """Cotangents of _shade_rows outputs -> cotangents of the record rows.

    recm: [rec, P] winners' records; g: [rows_out, P] output cotangents
    in the pass-B row layout. Returns the list of [*, P] gradient rows
    matching record layout (id/eids rows zero). Mirrors XLA autodiff of
    the same formulas, including the where-eps gates (d/den/w in the
    clamped region contribute NO gradient, like autodiff of
    `jnp.where(ok, v, eps)`).
    """
    f = _shade_rows(recm, px, py, C)
    iw, sx, sy, zf = f["iw"], f["sx"], f["sy"], f["zf"]
    l0, l1, l2 = f["l"]
    u, v = f["u"], f["v"]
    safe_d, safe_den = f["safe_d"], f["safe_den"]
    mf = f["m"].astype(jnp.float32)
    a0, a1, a2 = f["a"]

    gu = g[0:1] * mf
    gv = g[1:2] * mf
    gzw = g[2:3] * mf
    gsx = [g[3 + k:4 + k] for k in range(3)]
    gsy = [g[6 + k:7 + k] for k in range(3)]
    gfeat = g[9:9 + C] * mf                            # [C, P]

    # feat = u a0 + v a1 + (1-u-v) a2
    ubar = gu + jnp.sum(gfeat * (a0 - a2), axis=0, keepdims=True)
    vbar = gv + jnp.sum(gfeat * (a1 - a2), axis=0, keepdims=True)
    ga0 = gfeat * u
    ga1 = gfeat * v
    ga2 = gfeat * (1.0 - u - v)

    # u = lw0/safe_den, v = lw1/safe_den; den = lw0+lw1+lw2
    common = (ubar * u + vbar * v) / safe_den
    common = jnp.where(f["den_ok"], common, 0.0)
    lwbar = [ubar / safe_den - common,
             vbar / safe_den - common,
             -common]

    # lw_k = l_k iw_k ; zw = sum l_k zf_k ; l2 = 1 - l0 - l1
    lbar_d = [lwbar[0] * iw[0] + gzw * zf[0],
              lwbar[1] * iw[1] + gzw * zf[1],
              lwbar[2] * iw[2] + gzw * zf[2]]
    zfbar = [gzw * l0, gzw * l1, gzw * l2]
    iwbar = [lwbar[0] * l0, lwbar[1] * l1, lwbar[2] * l2]
    l0bar = lbar_d[0] - lbar_d[2]
    l1bar = lbar_d[1] - lbar_d[2]

    # l0 = n0/safe_d, l1 = n1/safe_d
    n0bar = l0bar / safe_d
    n1bar = l1bar / safe_d
    dbar = jnp.where(f["d_ok"], -(l0bar * l0 + l1bar * l1) / safe_d, 0.0)

    sxb = list(gsx)
    syb = list(gsy)
    # n0 = (sx1-px)(sy2-py) - (sx2-px)(sy1-py)
    sxb[1] = sxb[1] + n0bar * (sy[2] - py)
    syb[2] = syb[2] + n0bar * (sx[1] - px)
    sxb[2] = sxb[2] - n0bar * (sy[1] - py)
    syb[1] = syb[1] - n0bar * (sx[2] - px)
    # n1 = (sx2-px)(sy0-py) - (sx0-px)(sy2-py)
    sxb[2] = sxb[2] + n1bar * (sy[0] - py)
    syb[0] = syb[0] + n1bar * (sx[2] - px)
    sxb[0] = sxb[0] - n1bar * (sy[2] - py)
    syb[2] = syb[2] - n1bar * (sx[0] - px)
    # d = (sx1-sx0)(sy2-sy0) - (sx2-sx0)(sy1-sy0)
    sxb[1] = sxb[1] + dbar * (sy[2] - sy[0])
    syb[2] = syb[2] + dbar * (sx[1] - sx[0])
    sxb[2] = sxb[2] - dbar * (sy[1] - sy[0])
    syb[1] = syb[1] - dbar * (sx[2] - sx[0])
    sxb[0] = sxb[0] + dbar * (sy[1] - sy[2])
    syb[0] = syb[0] + dbar * (sx[2] - sx[1])

    # sx = x iw, sy = y iw, zf = z iw, iw = 1/safe_w
    xbar, ybar, zbar, wbar = [], [], [], []
    for k in range(3):
        xbar.append(sxb[k] * iw[k])
        ybar.append(syb[k] * iw[k])
        zbar.append(zfbar[k] * iw[k])
        iwk = (iwbar[k] + sxb[k] * f["x"][k] + syb[k] * f["y"][k]
               + zfbar[k] * f["z"][k])
        wbar.append(jnp.where(f["w_in"][k],
                              -iwk * iw[k] * iw[k], 0.0))

    rows = xbar + ybar + zbar + wbar          # record rows 0:12
    return rows, [ga0, ga1, ga2]


def _make_bwd_kernel(p, C, compact=False, sum_views=False,
                     use_recm=False):
    """Per-tile backward: re-extract the winners' records, run the
    hand-written shading VJP on [1, P] rows, then reduce the record
    gradients straight into face-table layout:
    g_tab[:, f] += sum_p onehot(slot_p == f) grec[:, p] over the tile's
    WINNING chunks (the only chunks with nonzero gradient).

    Chunks are shared between tiles, so the reduction ACCUMULATES: read
    chunk gradient block, add this tile's one-hot matmul contribution,
    write back. TPU grid steps execute sequentially and all in-flight
    stores are drained before the kernel body returns, so the
    read-modify-write is race-free; g_tab is zero-initialised via
    input/output aliasing.

    sum_views: gtab is [1, rec, Fpad] accumulated ACROSS the view grid
    axis (legal for the same sequential-grid reason), with the 12
    clip-coordinate gradient rows transformed to REST space in-kernel by
    the per-view projection matrix (rows j*3+k = Σ_c mats[b,j,c] ·
    g_clip[c*3+k] — 48 scalar·row FMAs per covered tile). The XLA
    reductions downstream then run on a B-times smaller table with no
    view sum; camera (mats) gradients are no longer recoverable, so this
    mode requires camera_grads=False.
    """
    rec = p["rec"]
    K = _CHUNK

    def kernel(*refs):
        # wmeta [1,1,1,4] SMEM: wcnt; wlist [1,1,1,wcap] SMEM int32
        # slot_ref [1,1,P,1] int32; g_ref [1,1,rows_out,P] f32
        # dyn/ids/sta_hbm: forward record table blocks (re-read) — OR,
        # with use_recm, recm_ref [1,1,rec,P] VMEM: the pass-B-saved
        # record slab (no re-extract at all)
        # zeros_ref: aliased input view of gtab_hbm (unused directly)
        # [sum_views] mats_ref [1, 16] f32 SMEM: this view's projection
        # gtab_hbm [B|1, rec, Fpad] ANY (zero-initialised via aliasing)
        refs = list(refs)
        tlist_ref = refs.pop(0) if compact else None
        wmeta_ref, wlist_ref, slot_ref, g_ref = refs[:4]
        refs = refs[4:]
        if use_recm:
            recm_ref = refs.pop(0)
            dyn_hbm = ids_hbm = sta_hbm = None
        else:
            dyn_hbm, ids_hbm, sta_hbm = refs[:3]
            refs = refs[3:]
        zeros_ref = refs.pop(0)
        mats_ref = refs.pop(0) if sum_views else None
        gtab_hbm = refs.pop(0)
        tri_buf = None if use_recm else refs.pop(0)
        grec_scr, stage_in, stage_out = refs[:3]
        refs = refs[3:]
        sems_t = None if use_recm else refs.pop(0)
        sems_r, sems_w = refs
        del zeros_ref
        b = pl.program_id(0)
        if compact:
            t = tlist_ref[b, pl.program_id(1)]
        else:
            t = pl.program_id(1)
        bs = None if use_recm else jnp.minimum(b, sta_hbm.shape[0] - 1)
        n_iter = wmeta_ref[0, 0, 0, 0]
        slot_col = slot_ref[0, 0]          # [P, 1] int32
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (_PIX, K), 1)

        # background tiles contribute nothing: gtab is zero-initialised
        # via aliasing and the RMW loop is empty, so skip the dense
        # shading-VJP row math entirely (the per-tile fixed cost)
        @pl.when(n_iter > 0)
        def _():
            # ---- winners' records: read the pass-B-saved slab, or
            # re-extract from the face tables
            if use_recm:
                recm = recm_ref[0, 0]
            else:
                recm = _extract_loop(p, b, bs, n_iter,
                                     lambda ci: wlist_ref[0, 0, 0, ci],
                                     slot_col, dyn_hbm, ids_hbm, sta_hbm,
                                     tri_buf, sems_t)
            px, py = _pix_ndc(p, t)
            coord_rows, attr_rows = _shade_vjp(recm, g_ref[0, 0], px, py, C)
            if sum_views:
                # clip -> rest space: g_rest[j, k] = Σ_c m[j, c]·g_clip[c, k]
                # (coord rows are component-major c*3+k; the transformed
                # rows are stored j*3+k). 48 scalar-broadcast FMAs.
                coord_rows = [
                    sum(mats_ref[b, j * 4 + c] * coord_rows[c * 3 + k]
                        for c in range(4))
                    for j in range(4) for k in range(3)
                ]
            zero = jnp.zeros((1, _PIX), jnp.float32)
            # single-row stores only (Mosaic sublane-alignment rule); rows
            # 12:24 (coord pad + id/eids) carry no gradient
            for i, r in enumerate(coord_rows):
                grec_scr[i:i + 1, :] = r
            for i in range(12, 24):
                grec_scr[i:i + 1, :] = zero
            for k in range(3):
                for c in range(C):
                    grec_scr[24 + k * C + c:25 + k * C + c, :] = \
                        attr_rows[k][c:c + 1]
            for i in range(24 + 3 * C, rec):
                grec_scr[i:i + 1, :] = zero
            grec = grec_scr[...]

            # ---- accumulate into the face-table gradient (RMW)
            bg = 0 if sum_views else b

            def rd(sl, ci):
                k0 = pl.multiple_of(wlist_ref[0, 0, 0, ci] * K, K)
                return pltpu.make_async_copy(
                    gtab_hbm.at[bg, :, pl.ds(k0, K)], stage_in.at[sl],
                    sems_r.at[sl])

            def wr(sl, ci):
                k0 = pl.multiple_of(wlist_ref[0, 0, 0, ci] * K, K)
                return pltpu.make_async_copy(
                    stage_out.at[sl], gtab_hbm.at[bg, :, pl.ds(k0, K)],
                    sems_w.at[sl])

            D = _EXTRACT_DEPTH
            for i in range(D - 1):
                @pl.when(i < n_iter)
                def _(i=i):
                    rd(i, i).start()

            def loop(ci, _):
                sl = jax.lax.rem(ci, D)

                @pl.when(ci + D - 1 < n_iter)
                def _():
                    rd(jax.lax.rem(ci + D - 1, D), ci + D - 1).start()

                c = wlist_ref[0, 0, 0, ci]
                onehot = (slot_col - c * K == k_iota).astype(jnp.float32)
                gc = _select_matmul(grec, onehot, 1, 0)  # [rec, K]
                rd(sl, ci).wait()
                # wait for the store that used this staging slot D iters
                # ago before overwriting it (distinct chunks within a
                # tile, so read-prefetch never aliases a pending write)
                @pl.when(ci >= D)
                def _():
                    wr(sl, ci - D).wait()
                stage_out[sl] = stage_in[sl] + gc
                wr(sl, ci).start()
                return 0

            jax.lax.fori_loop(0, n_iter, loop, 0)

            # drain outstanding stores (the last D loop iterations') so
            # the next grid step's reads observe them
            for i in range(D):
                ci = n_iter - D + i

                @pl.when(ci >= 0)
                def _(ci=ci):
                    wr(jax.lax.rem(ci, D), ci).wait()

    return kernel


# --------------------------------------------------------------------------
# custom_vjp core
# --------------------------------------------------------------------------

_CORE_CACHE: dict = {}


def get_deferred_core(topo: DeferredTopology, C: int, H: int, W: int, *,
                      max_span: int | None = None,
                      global_cap: int = 64, rows_budget: int | None = None,
                      winner_cap: int = 128, tiles_budget: int | None = None,
                      shared_attr: bool = False, interpret: bool = False,
                      projected: bool = False, tiled: bool = False,
                      fused: bool | None = None,
                      compact_out: bool = False, cull: int = 0,
                      camera_grads: bool = True):
    """Cached custom_vjp'd core for one (topology, config).

    Returned fn: (clip [B, V, 4], attr [B, V, C] — or [V, C] when
    shared_attr) -> (pix [rows_used, B, H, W] f32, ids [B, H, W] int32,
    counters [B, 3] int32: per-view [pairs dropped past the SMEM cap,
    winner-cap overflow, global-cap chunk drops] — all 0 on a healthy
    run).
    pix rows: 0 u, 1 v, 2 zw (masked barycentrics/depth), 3:6 sx per
    corner, 6:9 sy per corner, 9:9+C interpolated features (masked),
    9+C face id (float), 10+C:13+C AA edge ids, 13+C w_ok flag.
    Differentiable in clip/attr via the hand-written shading VJP.

    With `projected=True` the fn is (verts [V, 3], mats [B, 4, 4]
    row-vector view-projection matrices, attr) and the projection runs
    INSIDE the core: the corner gather is then B-independent ([3F, 4]
    rest rows instead of [3F, B*4]) and the per-view clip coords come
    from one MXU matmul; the backward vertex reduction is equally
    B-independent. clip[b] = verts_h @ mats[b] bit-matches
    project_verts(verts, w2c, proj) with mats = w2c @ proj up to the
    matmul association (allclose, not bit-equal).
    """
    F = int(topo.faces.shape[0])
    V = topo.num_vertices
    if max_span is None:
        max_span = default_max_span(F, H, W)
    if fused is None:
        # fused A+B kernel (one grid pass instead of two): env-default
        # until the on-hardware A/B settles it
        fused = os.environ.get("FMHR_FUSED_AB", "0") == "1"
    if compact_out:
        # compact output layout requires the compacted grid, the tiled
        # path, and the two-pass kernels
        assert tiled and tiles_budget is not None and not fused, (
            "compact_out needs tiled=True, a tiles_budget, and fused=False")
    # camera_grads=False (projected + shared attrs only): the backward
    # kernel transforms coordinate gradients to rest space in-kernel and
    # accumulates ONE view-summed [rec, Fpad] gradient table instead of
    # [B, rec, Fpad] — the downstream XLA reductions shrink B-fold. The
    # mats cotangent is then identically ZERO (cameras are constants in
    # every trainer); keep camera_grads=True to differentiate cameras.
    sum_views = projected and shared_attr and not camera_grads
    key = (id(topo), C, H, W, max_span, global_cap, rows_budget,
           winner_cap, tiles_budget, shared_attr, interpret, projected,
           tiled, fused, compact_out, cull, sum_views)
    if key in _CORE_CACHE:
        return _CORE_CACHE[key]

    p = _plan(F, V, C, H, W, max_span, global_cap, rows_budget, winner_cap,
              tiles_budget=tiles_budget)
    # Keep topology as NUMPY in the closure: the core is cached across jit
    # traces, and jnp constants created inside one trace would leak into
    # the next (UnexpectedTracerError).
    faces_np = topo.faces
    eids_np = np.asarray(topo.face_edge_ids, np.float32)
    inc_np = topo.vert_incidence
    tiles_y, tiles_x, T = p["tiles_y"], p["tiles_x"], p["T"]
    r_used, rec, nc, Fpad = p["r_used"], p["rec"], p["nc"], p["Fpad"]
    rows_used, rows_out = p["rows_used"], p["rows_out"]
    Hp, Wp = p["Hp"], p["Wp"]
    K = _CHUNK

    def _coords_from_clip(clip):
        B = clip.shape[0]
        faces_flat = jnp.asarray(faces_np.reshape(-1))   # [3F]
        # B-independent corner gather: ONE [V, B*4]-table row-gather of 3F
        # rows instead of B*3F gathered rows (gather cost scales with row
        # count, not row width), straight into TRANSPOSED table layout.
        clip_t = clip.transpose(1, 0, 2).reshape(V, B * 4)
        tri_flat = clip_t[faces_flat].reshape(F, 3, B, 4)
        # COMPONENT-major coord rows: x0 x1 x2 | y0 y1 y2 | z... | w...
        # (contiguous [3, P] corner slabs for the shading kernels)
        return tri_flat.transpose(2, 3, 1, 0).reshape(B, 12, F)

    def _tri_rest(verts):
        faces_flat = jnp.asarray(faces_np.reshape(-1))   # [3F]
        verts_h = jnp.concatenate(
            [verts, jnp.ones_like(verts[:, :1])], -1)    # [V, 4]
        return verts_h[faces_flat].reshape(F, 3, 4)      # narrow gather

    def _coords_projected(tri_rest, mats):
        # coords_t[b, c*3+k, f] = Σ_j rest[f, k, j] · mats[b, j, c] — the
        # per-view projection as ONE MXU contraction straight into the
        # component-major table layout (HIGHEST: clip coords feed the
        # pass-A edge functions)
        B = mats.shape[0]
        return jnp.einsum(
            "fkj,bjc->bckf", tri_rest, mats,
            precision=jax.lax.Precision.HIGHEST).reshape(B, 12, F)

    def _fwd_impl(coords_t, attr):
        B = coords_t.shape[0]
        faces_flat = jnp.asarray(faces_np.reshape(-1))   # [3F]
        if shared_attr:
            at_f = attr[faces_flat].reshape(F, 3, C)     # static, no B
            attr_t = at_f.transpose(1, 2, 0).reshape(1, 3 * C, F)
        else:
            at = attr.transpose(1, 0, 2).reshape(V, B * C)
            af = at[faces_flat].reshape(F, 3, B, C)
            attr_t = af.transpose(2, 1, 3, 0).reshape(B, 3 * C, F)

        # three-way record table: per-view dynamic coord rows, ONE static
        # id/edge-id block (a jit constant — never broadcast to B or
        # concatenated per step), and the attribute rows (ONE copy when
        # shared across views). Fpad == F when the topology was built by
        # DeferredTopology.build (it pre-pads with degenerate faces).
        # pad every section to its 8-aligned DMA row count (plan comment
        # in _plan): dyn 12->16, ids 4->8, attrs 3C->rec-24
        tab_dyn = jnp.pad(coords_t, ((0, 0), (0, 4), (0, 0)))
        tab_ids = jnp.concatenate(
            [jnp.asarray(topo.ext_face_ids)[None, None, :],
             jnp.asarray(eids_np.T)[None]], axis=1)      # [1, 4, Fpad]
        tab_ids = jnp.pad(tab_ids, ((0, 0), (0, 4), (0, 0)))
        tab_sta = attr_t
        if Fpad > F:
            tab_dyn = jnp.pad(tab_dyn, ((0, 0), (0, 0), (0, Fpad - F)))
            tab_ids = jnp.pad(tab_ids, ((0, 0), (0, 0), (0, Fpad - F)))
            tab_sta = jnp.pad(tab_sta, ((0, 0), (0, 0), (0, Fpad - F)))
        if rec > 24 + 3 * C:
            tab_sta = jnp.pad(
                tab_sta, ((0, 0), (0, rec - 24 - 3 * C), (0, 0)))

        # pass-A coefficient table + anchors
        tab_a, anchors = jax.vmap(
            lambda ct: _coeff_table(ct, p, H, W, cull=cull))(coords_t)

        # work lists from the transposed coords (screen xy + w rows)
        w_rows = coords_t[:, 9:12]                       # [B, 3, F]
        iw = 1.0 / jnp.where(jnp.abs(w_rows) > W_EPS, w_rows, W_EPS)
        sx_rows = coords_t[:, 0:3] * iw
        sy_rows = coords_t[:, 3:6] * iw
        chunk_list, starts, ends, g_list, g_cnt, n_drop, g_drop = jax.vmap(
            lambda sx, sy, w: _build_lists(
                sx, sy, w, p, H=H, W=W, max_span=max_span, cull=cull)
        )(sx_rows, sy_rows, w_rows)

        meta = jnp.stack(
            [starts, ends,
             jnp.broadcast_to(g_cnt[:, None], (B, T)),
             jnp.zeros((B, T), jnp.int32)], axis=-1)  # [B, T, 4]
        meta = meta[:, :, None, :]  # [B, T, 1, 4] (SMEM block rule)

        # ---- active-tile compaction (tiles_budget / p["ta_cap"]): the
        # kernels' grid runs over a per-view list of tiles whose chunk
        # bboxes are non-empty; bbox-inactive tiles are provably
        # background so skipping them is exact. The list is scalar-
        # prefetched; padding entries point at a DUMMY tile T whose meta
        # row is zero (the kernels' empty branch). Outputs gain the dummy
        # row; pix is zero-filled via input/output aliasing so inactive
        # tiles read as background downstream.
        ta_cap = p["ta_cap"]
        compact = ta_cap is not None
        tlist = None
        extra_drop = 0
        if compact:
            t_ar = jnp.arange(T, dtype=jnp.int32)
            txg = t_ar % tiles_x
            tyg = t_ar // tiles_x

            def _active_one(sx, sy, w):
                # same bboxes as _build_lists (XLA CSEs the shared math);
                # globals included — their coverage is also bbox-bounded
                ctx0, cty0, csx, csy, av = _chunk_bboxes(
                    sx, sy, w, p, H, W, cull=cull)
                hit = (
                    av[:, None]
                    & (txg[None, :] >= ctx0[:, None])
                    & (txg[None, :] < (ctx0 + csx)[:, None])
                    & (tyg[None, :] >= cty0[:, None])
                    & (tyg[None, :] < (cty0 + csy)[:, None])
                )                                        # [nc, T]
                return jnp.any(hit, axis=0)              # [T]

            active = jax.vmap(_active_one)(sx_rows, sy_rows, w_rows)
            tlist = jax.vmap(
                lambda a: jnp.nonzero(a, size=ta_cap, fill_value=T)[0]
            )(active).astype(jnp.int32)                  # [B, ta_cap]
            # active tiles beyond the budget are dropped; their main-list
            # pairs AND their share of the per-view global chunks join
            # counter col 0, so ANY tiles_budget overflow is guaranteed
            # nonzero there — including tiles covered solely by
            # oversize/global chunks (ADVICE r4: the one case the old
            # main-pairs-only count could not see). Fail-visible, like
            # pair_cap.
            ai = active.astype(jnp.int32)
            rank = jnp.cumsum(ai, axis=-1) - ai
            dropped = active & (rank >= ta_cap)
            extra_drop = (
                jnp.sum(jnp.where(dropped, ends - starts, 0), axis=-1)
                + g_cnt * jnp.sum(dropped.astype(jnp.int32), axis=-1)
            ).astype(jnp.int32)
            meta = jnp.pad(meta, ((0, 0), (0, 1), (0, 0), (0, 0)))
        # compact_out: outputs hold ta_cap active rows + 1 sentinel
        # background row (index ta_cap, never written, zero via aliasing)
        Tout = (ta_cap + 1 if compact_out else (T + 1 if compact else T))

        def _gridspec(in_specs, out_specs, compact_in=()):
            """(b, tile) grid; compact mode prefetches the tile list and
            index-maps the INPUTS through it (padding -> dummy tile T).
            With compact_out the OUTPUTS are written at the compact grid
            position (b, ta) instead — the [B, ta_cap+1, ...] output
            buffers then hold only active tiles (plus a guaranteed-
            background sentinel row at index ta_cap that no grid step
            writes), so downstream math and HBM traffic shrink by the
            active-tile fraction."""
            if not compact:
                return dict(grid=(B, T), in_specs=in_specs,
                            out_specs=out_specs)
            def wrap(s):
                if s.block_shape is None:   # ANY-space whole-array spec
                    return s
                f = s.index_map
                return pl.BlockSpec(
                    s.block_shape,
                    (lambda f: lambda b, ta, tl: f(b, tl[b, ta]))(f),
                    memory_space=s.memory_space)

            def wrap_out(s):
                if not compact_out:
                    return wrap(s)
                f = s.index_map
                return pl.BlockSpec(
                    s.block_shape,
                    (lambda f: lambda b, ta, tl: f(b, ta))(f),
                    memory_space=s.memory_space)
            # compact_in: positions of inputs that were WRITTEN at
            # compact grid positions by an earlier compact_out pass
            # (slot/winner outputs fed to pass B) — read back the same
            # way; everything else (meta tables) is dense-stored.
            def wrap_in(i, s):
                if compact_out and i in compact_in:
                    return wrap_out(s)
                return wrap(s)
            return dict(grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, ta_cap),
                in_specs=[wrap_in(i, s) for i, s in enumerate(in_specs)],
                out_specs=(wrap_out(out_specs) if not isinstance(
                    out_specs, (list, tuple))
                    else [wrap_out(s) for s in out_specs])))

        # ---- pass A: winning face index per pixel + in-kernel winner
        # compaction (distinct winning chunks per tile come straight out
        # of the kernel; no XLA sort/scatter compaction stage)
        passa_in = [
            pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, p["pair_cap"]),
                         lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, p["g_pad"]), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, nc), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        passa_out = [
            pl.BlockSpec((1, 1, _PIX, 1), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p["wcap"]),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 8), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        passb_out = pl.BlockSpec((1, 1, rows_out, _PIX),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
        if fused:
            # ---- fused A+B: one grid step per (view, tile) does
            # visibility + winner compaction + extraction + shading
            f_in = passa_in + [pl.BlockSpec(memory_space=pl.ANY)] * 3
            f_out = passa_out + [passb_out]
            f_args = (meta, chunk_list[:, None], g_list[:, None],
                      anchors, tab_a, tab_dyn, tab_ids, tab_sta)
            f_kw = {}
            if compact:
                pix_init = jnp.zeros((B, Tout, rows_out, _PIX),
                                     jnp.float32)
                f_in = f_in + [pl.BlockSpec(memory_space=pl.ANY)]
                f_args = (tlist,) + f_args + (pix_init,)
                # input index counts the scalar-prefetch operand;
                # pix is output 3
                f_kw["input_output_aliases"] = {9: 3}
            slot, wlist4, wstat, outf = pl.pallas_call(
                _make_fused_kernel(p, C, compact=compact),
                out_shape=[
                    jax.ShapeDtypeStruct((B, Tout, _PIX, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, Tout, 1, p["wcap"]),
                                         jnp.int32),
                    jax.ShapeDtypeStruct((B, Tout, 1, 8), jnp.int32),
                    jax.ShapeDtypeStruct((B, Tout, rows_out, _PIX),
                                         jnp.float32),
                ],
                interpret=interpret,
                **_gridspec(f_in, f_out),
                **f_kw,
            )(*f_args)
            wlist = wlist4[:, :, 0]
            wcnt = wstat[:, :, 0, 0]
            wmeta = jnp.stack(
                [wcnt, jnp.zeros_like(wcnt), jnp.zeros_like(wcnt),
                 jnp.zeros_like(wcnt)], axis=-1)[:, :, None, :]
            recm_saved = None
        else:
            passa_args = (meta, chunk_list[:, None], g_list[:, None],
                          anchors, tab_a)
            if compact:
                passa_args = (tlist,) + passa_args
            slot, wlist4, wstat = pl.pallas_call(
                _make_passa_kernel(p, compact=compact),
                out_shape=[
                    jax.ShapeDtypeStruct((B, Tout, _PIX, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, Tout, 1, p["wcap"]),
                                         jnp.int32),
                    jax.ShapeDtypeStruct((B, Tout, 1, 8), jnp.int32),
                ],
                interpret=interpret,
                **_gridspec(passa_in, passa_out),
            )(*passa_args)

            wlist = wlist4[:, :, 0]                      # [B, Tout, wcap]
            wcnt = wstat[:, :, 0, 0]                     # [B, Tout]
            # (compact mode: unvisited tiles' wcnt is uninitialized
            # memory — only ever read through tlist, where every entry
            # was visited)
            wmeta = jnp.stack(
                [wcnt, jnp.zeros_like(wcnt), jnp.zeros_like(wcnt),
                 jnp.zeros_like(wcnt)], axis=-1)[:, :, None, :]

            # ---- pass B: extract winner records + interpolate in-kernel
            passb_in = [
                pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, p["wcap"]),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, _PIX, 1), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            passb_args = (wmeta, wlist[:, :, None], slot,
                          tab_dyn, tab_ids, tab_sta)
            passb_kw = {}
            # compact_out training path: persist each active tile's
            # extracted [rec, P] record slab so the backward kernel reads
            # ONE block per tile instead of re-running the per-winner
            # extract loop (~half the backward kernel's work at prod).
            # [B, ta_cap+1, rec, P] = 75 MB at the prod preset — only
            # viable on the compacted grid (dense demo would be 2.4 GB).
            save_recm = (compact_out
                         and os.environ.get("FMHR_SAVE_RECM", "1") != "0")
            pb_out_shape = jax.ShapeDtypeStruct(
                (B, Tout, rows_out, _PIX), jnp.float32)
            pb_out_spec = passb_out
            if save_recm:
                pb_out_shape = [pb_out_shape, jax.ShapeDtypeStruct(
                    (B, Tout, rec, _PIX), jnp.float32)]
                pb_out_spec = [passb_out, pl.BlockSpec(
                    (1, 1, rec, _PIX), lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM)]
            if compact:
                pix_init = jnp.zeros((B, Tout, rows_out, _PIX),
                                     jnp.float32)
                passb_in = passb_in + [pl.BlockSpec(memory_space=pl.ANY)]
                passb_args = (tlist,) + passb_args + (pix_init,)
                # arg index counts the scalar-prefetch operand
                passb_kw["input_output_aliases"] = {7: 0}
            outf = pl.pallas_call(
                _make_passb_kernel(p, C, compact=compact,
                                   save_recm=save_recm),
                out_shape=pb_out_shape,
                interpret=interpret,
                **_gridspec(passb_in, pb_out_spec, compact_in=(0, 1, 2)),
                **passb_kw,
            )(*passb_args)
            recm_saved = None
            if save_recm:
                outf, recm_saved = outf
        if compact and not compact_out:
            outf = outf[:, :T]

        if tiled:
            # stay in the kernel's tile layout: no untile transpose (the
            # [B,T,r,P] -> [r,B,H,W] relayout + its backward retile
            # measured ~16 ms/step at the production preset); downstream
            # training math is elementwise/reduce, AA runs tiled.
            pix = outf[:, :, :rows_used]                 # [B, T, r, P]
            ids = jnp.round(pix[:, :, 9 + C]).astype(jnp.int32)
        else:
            # [B, T, rows_out, P] -> [rows_used, B, H, W]
            pix = outf[:, :, :rows_used].reshape(
                B, tiles_y, tiles_x, rows_used, TILE_H, TILE_W)
            pix = pix.transpose(3, 0, 1, 4, 2, 5).reshape(
                rows_used, B, Hp, Wp)
            pix = pix[:, :, :H, :W]
            ids = jnp.round(pix[9 + C]).astype(jnp.int32)
        # per-view overflow counters (VERDICT r2 #7): col 0 = live pairs
        # dropped past the SMEM pair cap (compact mode also adds the
        # pairs of active tiles dropped past tiles_budget), col 1 =
        # winner-cap overflow (distinct winning chunks beyond wcap; those
        # pixels render as background), col 2 = oversize chunks dropped
        # past global_cap (ADVICE r3: previously silent). All 0 on a
        # healthy run.
        if compact:
            if compact_out:
                # rows ARE the visited tiles (plus zero-writing padding
                # steps); the sentinel row ta_cap is never written but
                # also never summed (slice to ta_cap)
                wover = wstat[:, :ta_cap, 0, 1].sum(axis=1)
            else:
                # unvisited tiles' wstat is uninitialized memory: reduce
                # the overflow column over the VISITED (tlist) tiles only
                bi = jnp.arange(B, dtype=jnp.int32)[:, None]
                wover = wstat[bi, tlist][:, :, 0, 1].sum(axis=1)
            counters = jnp.stack(
                [n_drop + extra_drop, wover, g_drop], axis=-1)
        else:
            counters = jnp.stack(
                [n_drop, wstat[:, :, 0, 1].sum(axis=1), g_drop],
                axis=-1)  # [B, 3]
        return (pix, ids, counters, slot, wmeta, wlist, tab_dyn, tab_ids,
                tab_sta, tlist, recm_saved)

    def _bwd_gtab(res, cts, mats=None):
        """Shared backward trunk: pixel cotangents -> face-table gradient
        [B, rec, Fpad] (kernel) + attribute gradient. With sum_views the
        table is [1, rec, Fpad], already summed over views and with the
        coordinate rows in REST space (mats required)."""
        g_pix = cts[0]
        (slot, wmeta, wlist, tab_dyn, tab_ids, tab_sta, tlist,
         recm_saved, B) = res
        compact = tlist is not None
        use_recm = recm_saved is not None

        if tiled:
            # cotangents arrive already tiled [B, T, rows_used, P]
            if compact_out:
                # sentinel background row: a constant output — its
                # cotangent is dropped (same as inactive dense tiles)
                g_pix = g_pix[:, :p["ta_cap"]]
            g = jnp.pad(g_pix, ((0, 0), (0, 0),
                                (0, rows_out - rows_used), (0, 0)))
        else:
            # [rows_used, B, H, W] -> [B, T, rows_out, P]
            g = jnp.pad(g_pix, ((0, rows_out - rows_used), (0, 0),
                                (0, Hp - H), (0, Wp - W)))
            g = g.reshape(rows_out, B, tiles_y, TILE_H, tiles_x, TILE_W)
            g = g.transpose(1, 2, 4, 0, 3, 5).reshape(B, T, rows_out, _PIX)
        if compact and not compact_out:
            # dummy-tile row for the padding entries of tlist. Inactive
            # tiles' cotangents are correctly DROPPED: their pix output
            # is constant background, so their true input gradient is 0.
            g = jnp.pad(g, ((0, 0), (0, 1), (0, 0), (0, 0)))

        kernel = _make_bwd_kernel(p, C, compact=compact,
                                  sum_views=sum_views, use_recm=use_recm)
        Bg = 1 if sum_views else B
        zeros = jnp.zeros((Bg, rec, Fpad), jnp.float32)
        bwd_in = [
            pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, p["wcap"]),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _PIX, 1), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows_out, _PIX),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if use_recm:
            # the fwd-saved record slab replaces the three table inputs
            # AND the whole per-winner extract loop
            bwd_in = bwd_in + [
                pl.BlockSpec((1, 1, rec, _PIX), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            bwd_tables = (recm_saved,)
        else:
            bwd_in = bwd_in + [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            bwd_tables = (tab_dyn, tab_ids, tab_sta)
        bwd_out = pl.BlockSpec(memory_space=pl.ANY)
        scratch = ([] if use_recm else [
            pltpu.VMEM((_EXTRACT_DEPTH, rec, K), jnp.float32)]) + [
            pltpu.VMEM((rec, _PIX), jnp.float32),
            pltpu.VMEM((_EXTRACT_DEPTH, rec, K), jnp.float32),
            pltpu.VMEM((_EXTRACT_DEPTH, rec, K), jnp.float32),
        ] + ([] if use_recm else [
            pltpu.SemaphoreType.DMA((_EXTRACT_DEPTH, 3))]) + [
            pltpu.SemaphoreType.DMA((_EXTRACT_DEPTH,)),
            pltpu.SemaphoreType.DMA((_EXTRACT_DEPTH,)),
        ]
        bwd_args = (wmeta, wlist[:, :, None], slot, g) + bwd_tables + (
            zeros,)
        if sum_views:
            # per-view projection matrices for the in-kernel rest-space
            # transform, [B, 16] row-major (j, c) in SMEM. The block is
            # the WHOLE array (1 KB at 16 views) — Mosaic requires block
            # dims divisible by (8, 128) or equal to the array's, and
            # the kernel indexes its own view row by program id.
            bwd_in = bwd_in + [pl.BlockSpec(
                (B, 16), lambda b, t: (0, 0), memory_space=pltpu.SMEM)]
            bwd_args = bwd_args + (mats.reshape(B, 16),)
        if compact:
            def wrap(s):
                if s.block_shape is None:
                    return s
                f = s.index_map
                if compact_out:
                    # fwd wrote slot/wlist/wmeta (and the loss produced
                    # g) at COMPACT positions; read them back the same
                    # way. tlist stays prefetched for the kernel body
                    # (tile origin for the shading VJP).
                    return pl.BlockSpec(
                        s.block_shape,
                        (lambda f: lambda b, ta, tl: f(b, ta))(f),
                        memory_space=s.memory_space)
                return pl.BlockSpec(
                    s.block_shape,
                    (lambda f: lambda b, ta, tl: f(b, tl[b, ta]))(f),
                    memory_space=s.memory_space)

            grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, p["ta_cap"]),
                in_specs=[wrap(s) for s in bwd_in],
                out_specs=bwd_out,
                scratch_shapes=scratch))
            bwd_args = (tlist,) + bwd_args
            # zeros' arg index counts the scalar-prefetch operand
            alias = {(6 if use_recm else 8): 0}
        else:
            grid_kw = dict(grid=(B, T), in_specs=bwd_in,
                           out_specs=bwd_out, scratch_shapes=scratch)
            alias = {(5 if use_recm else 7): 0}
        gtab = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bg, rec, Fpad), jnp.float32),
            input_output_aliases=alias,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            **grid_kw,
        )(*bwd_args)

        inc_j = jnp.asarray(inc_np)                    # [V, D]

        if sum_views:
            # already view-summed by the kernel (sum_views => shared_attr)
            g_af = (gtab[0, 24:24 + 3 * C, :F].reshape(3, C, F)
                    .transpose(2, 0, 1).reshape(F * 3, C))
            g_af = jnp.concatenate(
                [g_af, jnp.zeros((1, C), g_af.dtype)], axis=0)
            g_attr = g_af[inc_j].sum(axis=1)           # [V, C]
            return gtab, g_attr, inc_j, B

        g_attr_t = gtab[:, 24:24 + 3 * C, :F].reshape(B, 3, C, F)
        if shared_attr:
            g_af = g_attr_t.sum(axis=0).transpose(2, 0, 1).reshape(F * 3, C)
            g_af = jnp.concatenate(
                [g_af, jnp.zeros((1, C), g_af.dtype)], axis=0)
            g_attr = g_af[inc_j].sum(axis=1)           # [V, C]
        else:
            g_af = g_attr_t.transpose(3, 1, 0, 2).reshape(F * 3, B * C)
            g_af = jnp.concatenate(
                [g_af, jnp.zeros((1, B * C), g_af.dtype)], axis=0)
            g_attr = g_af[inc_j].sum(axis=1)           # [V, B*C]
            g_attr = g_attr.reshape(V, B, C).transpose(1, 0, 2)
        return gtab, g_attr, inc_j, B

    # compact_out additionally returns tlist (the per-view active-tile
    # list) as a primal output: the finalize/loss need it to gather
    # images and resolve tile neighbors. Integer output — zero cotangent.
    n_out = 4 if compact_out else 3

    def _primal(out):
        return out[:3] + ((out[9],) if compact_out else ())

    if not projected:

        def core(clip, attr):
            return _primal(_fwd_impl(_coords_from_clip(clip), attr))

        def core_fwd(clip, attr):
            out = _fwd_impl(_coords_from_clip(clip), attr)
            return _primal(out), out[3:] + (clip.shape[0],)

        def core_bwd(res, cts):
            gtab, g_attr, inc_j, B = _bwd_gtab(res, cts)
            # coords: [B, 12, F] component-major -> corner-major
            # [3F, B*4], then ONE B-independent incidence gather
            # (V*D rows, not B*V*D)
            g_coords = gtab[:, :12, :F].reshape(B, 4, 3, F)
            g_coords = g_coords.transpose(3, 2, 0, 1).reshape(F * 3, B * 4)
            g_coords = jnp.concatenate(
                [g_coords, jnp.zeros((1, B * 4), g_coords.dtype)], axis=0)
            g_clip = g_coords[inc_j].sum(axis=1)       # [V, B*4]
            g_clip = g_clip.reshape(V, B, 4).transpose(1, 0, 2)
            return g_clip, g_attr

    else:

        def core(verts, mats, attr):
            return _primal(_fwd_impl(
                _coords_projected(_tri_rest(verts), mats), attr))

        def core_fwd(verts, mats, attr):
            tri_rest = _tri_rest(verts)
            out = _fwd_impl(_coords_projected(tri_rest, mats), attr)
            return _primal(out), out[3:] + (mats.shape[0], tri_rest, mats)

        def core_bwd(res, cts):
            tri_rest, mats = res[-2:]
            if sum_views:
                gtab, g_attr, inc_j, B = _bwd_gtab(res[:-2], cts,
                                                   mats=mats)
                # rows j*3+k (rest space, view-summed in-kernel) ->
                # corner-major [F*3, 4] -> ONE incidence gather
                g_rest = (gtab[0, :12, :F].reshape(4, 3, F)
                          .transpose(2, 1, 0).reshape(F * 3, 4))
                g_rest = jnp.concatenate(
                    [g_rest, jnp.zeros((1, 4), g_rest.dtype)], axis=0)
                g_vh = g_rest[inc_j].sum(axis=1)       # [V, 4]
                # camera_grads=False: mats cotangent not recoverable from
                # the summed table — identically zero by contract
                return g_vh[:, :3], jnp.zeros_like(mats), g_attr
            gtab, g_attr, inc_j, B = _bwd_gtab(res[:-2], cts)
            g_tri = gtab[:, :12, :F].reshape(B, 4, 3, F)
            # transpose of the projection matmul: back to rest space,
            # summing over views and components on the MXU
            g_rest = jnp.einsum(
                "bckf,bjc->fkj", g_tri, mats,
                precision=jax.lax.Precision.HIGHEST).reshape(F * 3, 4)
            g_rest = jnp.concatenate(
                [g_rest, jnp.zeros((1, 4), g_rest.dtype)], axis=0)
            g_vh = g_rest[inc_j].sum(axis=1)           # [V, 4] — no B
            g_verts = g_vh[:, :3]   # homogeneous 1-row has no cotangent
            g_mats = jnp.einsum(
                "bckf,fkj->bjc", g_tri, tri_rest,
                precision=jax.lax.Precision.HIGHEST)
            return g_verts, g_mats, g_attr

    core_vjp = jax.custom_vjp(core)
    core_vjp.defvjp(core_fwd, core_bwd)
    _CORE_CACHE[key] = core_vjp
    return core_vjp


# --------------------------------------------------------------------------
# High-level render path (mirrors api.render_pixels)
# --------------------------------------------------------------------------

def audit_deferred_rows(clip, faces, resolution, max_span: int | None = None,
                        cull: int = 0):
    """Per-view live (tile, chunk) pair counts for sizing `rows_budget`.

    clip [B, V, 4] (concrete); returns (live_counts [B] np, suggested
    budget int). Run once at scene setup; the budget is static thereafter.
    """
    H, W = resolution
    faces = np.asarray(faces, np.int32)
    F = int(faces.shape[0])
    # same degenerate-face padding as DeferredTopology.build so the audit
    # sees exactly the runtime's chunk bboxes
    Fp = _round_up(max(F, 1), _CHUNK)
    if Fp > F:
        faces = np.concatenate([faces, np.zeros((Fp - F, 3), np.int32)])
    if max_span is None:
        max_span = default_max_span(F, H, W)
    p = _plan(Fp, 0, 0, H, W, max_span, 64, quiet=True)
    nc, T = p["nc"], p["T"]

    def one(tri):
        sx_ = tri[..., 0].T
        sy_ = tri[..., 1].T
        w_ = tri[..., 3].T
        iw = 1.0 / jnp.where(jnp.abs(w_) > W_EPS, w_, W_EPS)
        sx_, sy_ = sx_ * iw, sy_ * iw
        _, _, cspan_x, cspan_y, any_valid = _chunk_bboxes(
            sx_, sy_, w_, p, H, W, cull=cull)
        n_tiles = cspan_x * cspan_y
        emit = any_valid & (n_tiles <= max_span)
        return jnp.sum(jnp.where(emit, n_tiles, 0))

    # Setup-only integer counting: run ON HOST CPU in one vmapped call.
    # The per-view TPU dispatches this used to do cost ~350 s of tunnel
    # round-trips + remote compiles per bench process (r5_warm2_trace).
    clip_np = np.asarray(clip)
    with jax.default_device(jax.devices("cpu")[0]):
        tris = jnp.asarray(clip_np)[:, np.asarray(faces)]   # [B, Fp, 3, 4]
        live = np.asarray(jax.jit(jax.vmap(one))(tris))
    budget = _round_up(int(live.max() * 1.3) + 128, 128)
    return live, min(budget, nc * max_span)


def audit_active_tiles(clip, faces, resolution, max_span: int | None = None,
                       cull: int = 0):
    """Per-view count of tiles touched by ANY chunk bbox, for sizing
    `tiles_budget` (the active-tile compacted kernel grid).

    clip [B, V, 4] (concrete); returns (counts [B] np, suggested budget
    int). Like `audit_deferred_rows`, run once at scene setup; budget
    with margin because the mesh deforms during optimization (active
    tiles past the budget drop their pairs into counter col 0 —
    fail-visible).
    """
    H, W = resolution
    faces = np.asarray(faces, np.int32)
    F = int(faces.shape[0])
    Fp = _round_up(max(F, 1), _CHUNK)
    if Fp > F:
        faces = np.concatenate([faces, np.zeros((Fp - F, 3), np.int32)])
    if max_span is None:
        max_span = default_max_span(F, H, W)
    p = _plan(Fp, 0, 0, H, W, max_span, 64, quiet=True)
    T, tiles_x = p["T"], p["tiles_x"]

    def one(tri):
        sx_ = tri[..., 0].T
        sy_ = tri[..., 1].T
        w_ = tri[..., 3].T
        iw = 1.0 / jnp.where(jnp.abs(w_) > W_EPS, w_, W_EPS)
        sx_, sy_ = sx_ * iw, sy_ * iw
        ctx0, cty0, csx, csy, av = _chunk_bboxes(sx_, sy_, w_, p, H, W,
                                                 cull=cull)
        t_ar = jnp.arange(T, dtype=jnp.int32)
        txg = t_ar % tiles_x
        tyg = t_ar // tiles_x
        hit = (
            av[:, None]
            & (txg[None, :] >= ctx0[:, None])
            & (txg[None, :] < (ctx0 + csx)[:, None])
            & (tyg[None, :] >= cty0[:, None])
            & (tyg[None, :] < (cty0 + csy)[:, None])
        )
        return jnp.sum(jnp.any(hit, axis=0))

    # host-CPU, one vmapped call — see audit_deferred_rows
    clip_np = np.asarray(clip)
    with jax.default_device(jax.devices("cpu")[0]):
        tris = jnp.asarray(clip_np)[:, np.asarray(faces)]   # [B, Fp, 3, 4]
        counts = np.asarray(jax.jit(jax.vmap(one))(tris))
    budget = _round_up(int(counts.max() * 1.3) + 16, 8)
    return counts, min(budget, T)


def audit_global_chunks(clip, faces, resolution,
                        max_span: int | None = None, cull: int = 0):
    """Per-view count of GLOBAL (oversize) chunks — chunks whose tile
    span exceeds max_span and therefore ride the per-view global list
    bounded by `global_cap`. Round 5: the full-res pipeline overflowed
    the fixed default cap of 64 (17.6k dropped chunks across stage B),
    so the cap is now audited from the start mesh like rows/tiles.

    Returns (counts [B] np, suggested global_cap int: 2x the max with a
    floor of 64 — the mesh deforms during optimization and overflow is
    fail-visible in counter col 2).
    """
    H, W = resolution
    faces = np.asarray(faces, np.int32)
    F = int(faces.shape[0])
    Fp = _round_up(max(F, 1), _CHUNK)
    if Fp > F:
        faces = np.concatenate([faces, np.zeros((Fp - F, 3), np.int32)])
    if max_span is None:
        max_span = default_max_span(F, H, W)
    p = _plan(Fp, 0, 0, H, W, max_span, 64, quiet=True)

    def one(tri):
        sx_ = tri[..., 0].T
        sy_ = tri[..., 1].T
        w_ = tri[..., 3].T
        iw = 1.0 / jnp.where(jnp.abs(w_) > W_EPS, w_, W_EPS)
        sx_, sy_ = sx_ * iw, sy_ * iw
        _, _, csx, csy, av = _chunk_bboxes(sx_, sy_, w_, p, H, W,
                                           cull=cull)
        return jnp.sum(av & (csx * csy > max_span))

    clip_np = np.asarray(clip)
    with jax.default_device(jax.devices("cpu")[0]):
        tris = jnp.asarray(clip_np)[:, np.asarray(faces)]
        counts = np.asarray(jax.jit(jax.vmap(one))(tris))
    return counts, max(64, _round_up(2 * int(counts.max()) + 8, 8))


def dense_tile_count(num_faces: int, resolution) -> int:
    """Dense kernel grid size T for this image size — the denominator of
    the active-tile fraction `tiles_budget / T` (used to scale memory
    estimates that were anchored on dense-grid buffer footprints)."""
    H, W = resolution
    F = _round_up(max(int(num_faces), 1), _CHUNK)
    p = _plan(F, 0, 0, H, W, default_max_span(num_faces, H, W), 64,
              quiet=True)
    return int(p["T"])


def render_pixels_deferred(clip, attr, topo: DeferredTopology, resolution,
                           *, max_span: int | None = None,
                           global_cap: int = 64, rows_budget: int | None = None,
                           winner_cap: int = 128,
                           tiles_budget: int | None = None,
                           with_aa: bool = True, aa_budget=None,
                           interpret: bool = False,
                           mesh=None, views_axis: str = "views",
                           with_counters: bool = False, cull: int = 0):
    """Deferred-path drop-in for api.render_pixels.

    clip [B, V, 4]; attr [V, C] or [B, V, C]. Returns
    (rast [B, H, W, 4], feat [B, H, W, C], aa_weights|None); with
    `with_counters=True` appends counters [B, 3] int32 (per-view pairs
    dropped past the SMEM cap, winner-cap overflow, global-cap chunk
    drops — 0 when healthy), so
    trainers can surface capacity degradation in their loss traces.
    Barycentrics and feature interpolation happen INSIDE the pass-B
    kernel; only the antialias pass (which needs cross-pixel neighbors)
    stays in XLA, fed by the per-pixel screen coords/edge ids the kernel
    emits.

    Multi-chip: pass the device `mesh` to run the Pallas core under
    `shard_map` over `views_axis` — each device rasterizes its own view
    shard (GSPMD cannot partition a pallas_call by itself). Per-view
    outputs/gradients stay local; the replicated-attribute gradient
    psums across the axis via the shard_map transpose. Validated against
    the single-device path on a virtual CPU mesh
    (tests/test_dist.py::test_deferred_sharded_matches_single).
    """
    from .antialias import antialias_weights

    H, W = resolution
    B = clip.shape[0]
    C = attr.shape[-1]

    core = get_deferred_core(topo, C, H, W,
                             max_span=max_span, global_cap=global_cap,
                             rows_budget=rows_budget, winner_cap=winner_cap,
                             tiles_budget=tiles_budget,
                             shared_attr=attr.ndim == 2,
                             interpret=interpret, cull=cull)
    if mesh is not None and views_axis in mesh.axis_names:
        try:
            from jax import shard_map
        except ImportError:  # pre-0.8 jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        vspec = P(views_axis)
        attr_spec = P() if attr.ndim == 2 else vspec
        sm_kw = dict(mesh=mesh, in_specs=(vspec, attr_spec),
                     out_specs=(P(None, views_axis), vspec, vspec))
        try:
            core = shard_map(core, check_vma=False, **sm_kw)
        except TypeError:  # older jax spelling
            core = shard_map(core, check_rep=False, **sm_kw)
    pix, ids, counters = core(clip, attr)
    return _finalize_deferred(pix, ids, topo, C, clip.dtype, with_aa,
                              aa_budget, counters, with_counters)


def _finalize_deferred(pix, ids, topo, C, dtype, with_aa, aa_budget=None,
                       counters=None, with_counters=False):
    """aa_budget: None (default) = dense AA math over all pixel pairs; an
    int (or (h, v) pair) = compact active-pair path, bit-identical when
    the budget fits — size it from `antialias.audit_aa_pairs` on a
    concrete id map with margin. Note "active" means EVERY face-id
    transition (interior shared-edge pairs can still AA via a non-shared
    edge at subpixel density), so at production mesh density the count
    scales with covered area, not silhouette length — always audit, never
    guess. "auto" = 4x B*(H+W) heuristic, ONLY safe for coarse meshes.
    FMHR_AA_MODE=dense env-forces the dense path."""
    from .antialias import antialias_weights

    if os.environ.get("FMHR_AA_MODE") == "dense":
        aa_budget = None
    if isinstance(aa_budget, str):
        if aa_budget != "auto":
            raise ValueError(
                f"aa_budget={aa_budget!r}: expected None, an int, an "
                "(h, v) pair, or 'auto'")
        B, H, W = ids.shape
        aa_budget = _round_up(4 * B * (H + W), 128)

    mask = ids > 0
    rast = jnp.stack(
        [pix[0], pix[1], pix[2],
         jnp.where(mask, ids.astype(dtype), 0.0)], axis=-1)
    feat = jnp.moveaxis(pix[9:9 + C], 0, -1)

    aa_w = None
    if with_aa:
        eids = tuple(jnp.round(pix[10 + C + k]).astype(jnp.int32)
                     for k in range(3))
        ctx = {
            "ids": ids, "mask": mask, "face_idx": None,
            "sx": [pix[3], pix[4], pix[5]],
            "sy": [pix[6], pix[7], pix[8]],
            "w_ok": pix[13 + C] > 0.5,
            "eids": eids,
        }
        aa_w = antialias_weights(rast, None, topo.faces, topology=None,
                                 context=ctx, budget=aa_budget)
    if with_counters:
        return rast, feat, aa_w, counters
    return rast, feat, aa_w


def tile_grid(resolution, dtype=jnp.float32):
    """Static per-tile pixel metadata for the tiled training layout.

    Returns a dict with [T, P] arrays: "u"/"v" NDC pixel centers (same
    formula as the dense AA path), "valid" (inside the un-padded H x W),
    plus the tile/grid dims. Cheap iota math — trace it, don't bake
    constants.
    """
    H, W = resolution
    tiles_y = -(-H // TILE_H)
    tiles_x = -(-W // TILE_W)
    T = tiles_y * tiles_x
    t = jnp.arange(T, dtype=jnp.int32)[:, None]
    j = jnp.arange(_PIX, dtype=jnp.int32)[None, :]
    x = (t % tiles_x) * TILE_W + j % TILE_W
    y = (t // tiles_x) * TILE_H + j // TILE_W
    u = (x.astype(dtype) + 0.5) * (2.0 / W) - 1.0
    v = (y.astype(dtype) + 0.5) * (2.0 / H) - 1.0
    return {"u": u, "v": v, "valid": (x < W) & (y < H),
            "tiles_x": tiles_x, "tiles_y": tiles_y,
            "tile_h": TILE_H, "tile_w": TILE_W, "T": T}


def tile_images(img, resolution):
    """[B, H, W, C] (or [B, H, W]) image -> tiled [B, T, C, P] (or
    [B, T, P]), zero-padded to the tile grid. One-time setup cost; the
    training loop never untiles."""
    H, W = resolution
    squeeze = img.ndim == 3
    if squeeze:
        img = img[..., None]
    B, _, _, C = img.shape
    tiles_y = -(-H // TILE_H)
    tiles_x = -(-W // TILE_W)
    img = jnp.pad(img, ((0, 0), (0, tiles_y * TILE_H - H),
                        (0, tiles_x * TILE_W - W), (0, 0)))
    img = img.reshape(B, tiles_y, TILE_H, tiles_x, TILE_W, C)
    img = img.transpose(0, 1, 3, 5, 2, 4).reshape(
        B, tiles_y * tiles_x, C, _PIX)
    return img[:, :, 0] if squeeze else img


def untile_images(timg, resolution):
    """Inverse of `tile_images` (eval/export; not on the training path)."""
    H, W = resolution
    squeeze = timg.ndim == 3
    if squeeze:
        timg = timg[:, :, None]
    B, T, C, _ = timg.shape
    tiles_y = -(-H // TILE_H)
    tiles_x = -(-W // TILE_W)
    img = timg.reshape(B, tiles_y, tiles_x, C, TILE_H, TILE_W)
    img = img.transpose(0, 1, 4, 2, 5, 3).reshape(
        B, tiles_y * TILE_H, tiles_x * TILE_W, C)
    img = img[:, :H, :W]
    return img[..., 0] if squeeze else img


def _finalize_deferred_tiled(pix, ids, topo, C, dtype, with_aa, resolution,
                             counters):
    """Tiled-layout finalize: no untile. pix [B, T, rows_used, P].

    Returns a dict: "feat" [B, T, C, P] (interpolated attributes),
    "ids" [B, T, P] int32, "grid" (see `tile_grid`), "aa" (weights for
    `apply_antialias_tiled`, or None), "counters" [B, 3].
    """
    from .antialias import antialias_weights_tiled

    grid = tile_grid(resolution, dtype)
    feat = pix[:, :, 9:9 + C]
    aa_w = None
    if with_aa:
        comp = {
            "ids": ids,
            "zw": pix[:, :, 2],
            "w_ok": pix[:, :, 13 + C] > 0.5,
            "sx": [pix[:, :, 3 + k] for k in range(3)],
            "sy": [pix[:, :, 6 + k] for k in range(3)],
            "eids": tuple(jnp.round(pix[:, :, 10 + C + k]).astype(jnp.int32)
                          for k in range(3)),
        }
        aa_w = antialias_weights_tiled(comp, grid)
    return {"feat": feat, "ids": ids, "grid": grid, "aa": aa_w,
            "counters": counters}


def gather_tiles(timg, tlist, T):
    """Gather dense tiled data [B, T, ...] to the compact row order
    [B, ta_cap+1, ...] given the per-view active-tile list `tlist`
    [B, ta_cap] (dense ids; padding = T). A zero row is appended for the
    padding/sentinel entries, so gathered padding rows read as zeros.
    Used for the static image/mask targets of the compact training loss.
    """
    B = timg.shape[0]
    pad = [(0, 0)] * timg.ndim
    pad[1] = (0, 1)
    timg_p = jnp.pad(timg, pad)                     # [B, T+1, ...]
    tl = jnp.concatenate(
        [tlist, jnp.full((B, 1), T, tlist.dtype)], axis=1)  # [B, TA+1]
    idx = tl.reshape(tl.shape + (1,) * (timg.ndim - 2))
    return jnp.take_along_axis(timg_p, idx, axis=1)


def compact_neighbors(tlist, tiles_x, tiles_y, T):
    """Right/down neighbor COMPACT row index for every compact row.

    Returns {"h": [B, TA+1], "v": [B, TA+1]} int32 where the value is the
    neighbor's row in the compact layout, or ta_cap (the sentinel
    background row) when the neighbor tile is bbox-inactive, off-grid, or
    the row is padding. posmap is a [B, T+2] scatter of tlist — O(B*T).
    """
    B, ta_cap = tlist.shape
    bi = jnp.arange(B, dtype=jnp.int32)[:, None]
    posmap = jnp.full((B, T + 2), ta_cap, jnp.int32)
    # padding entries (tlist == T) write column T; it is never read back
    # through a valid neighbor lookup (guards below map those to T + 1)
    posmap = posmap.at[bi, tlist].set(
        jnp.broadcast_to(jnp.arange(ta_cap, dtype=jnp.int32), (B, ta_cap)))
    tl1 = jnp.concatenate(
        [tlist, jnp.full((B, 1), T, tlist.dtype)], axis=1)  # [B, TA+1]
    real = tl1 < T
    tx = tl1 % tiles_x
    ty = tl1 // tiles_x
    nbr_h = jnp.where(real & (tx < tiles_x - 1), tl1 + 1, T + 1)
    nbr_v = jnp.where(real & (ty < tiles_y - 1), tl1 + tiles_x, T + 1)
    return {"h": posmap[bi, nbr_h], "v": posmap[bi, nbr_v]}


def _finalize_deferred_compact(pix, ids, topo, C, dtype, with_aa,
                               resolution, counters, tlist):
    """Compact-layout finalize: rows are ACTIVE tiles (bbox-audited,
    per-view) plus a guaranteed-background sentinel row at index ta_cap.
    pix [B, ta_cap+1, rows_used, P].

    Returns a dict like `_finalize_deferred_tiled` plus "tlist" (dense
    tile ids per row) and gathered per-row grid metadata. The training
    loss runs entirely on these compact arrays — work and HBM traffic
    scale with covered tiles, not the image area.
    """
    from .antialias import antialias_weights_compact

    H, W = resolution
    grid = tile_grid(resolution, dtype)
    T = grid["T"]
    B, TA1 = pix.shape[0], pix.shape[1]
    feat = pix[:, :, 9:9 + C]

    # per-row static grid metadata (sentinel/padding rows: valid=False).
    # Direct row-gather from the [T+1, P] tables — no dense [B, T, P]
    # broadcast is ever materialized.
    tl1 = jnp.concatenate(
        [tlist, jnp.full((B, 1), T, tlist.dtype)], axis=1)  # [B, TA+1]
    u_g = jnp.pad(grid["u"], ((0, 1), (0, 0)))[tl1]
    v_g = jnp.pad(grid["v"], ((0, 1), (0, 0)))[tl1]
    val_g = jnp.pad(grid["valid"], ((0, 1), (0, 0)))[tl1]
    gridc = {
        "layout": "compact",
        "u": u_g, "v": v_g, "valid": val_g,
        "tiles_x": grid["tiles_x"], "tiles_y": grid["tiles_y"],
        "tile_h": TILE_H, "tile_w": TILE_W, "T": T,
        "H": H, "W": W,
        "tlist": tlist,
        "nbr": compact_neighbors(tlist, grid["tiles_x"], grid["tiles_y"],
                                 T),
    }
    aa_w = None
    if with_aa:
        comp = {
            "ids": ids,
            "zw": pix[:, :, 2],
            "w_ok": pix[:, :, 13 + C] > 0.5,
            "sx": [pix[:, :, 3 + k] for k in range(3)],
            "sy": [pix[:, :, 6 + k] for k in range(3)],
            "eids": tuple(jnp.round(pix[:, :, 10 + C + k]).astype(jnp.int32)
                          for k in range(3)),
        }
        aa_w = antialias_weights_compact(comp, gridc)
    return {"feat": feat, "ids": ids, "grid": gridc, "aa": aa_w,
            "counters": counters, "tlist": tlist}


def render_pixels_projected(verts, mats, attr, topo: DeferredTopology,
                            resolution, *, max_span: int | None = None,
                            global_cap: int = 64,
                            rows_budget: int | None = None,
                            winner_cap: int = 128,
                            tiles_budget: int | None = None,
                            with_aa: bool = True,
                            aa_budget=None, interpret: bool = False,
                            mesh=None, views_axis: str = "views",
                            with_counters: bool = False,
                            layout: str = "image",
                            fused: bool | None = None,
                            cull: int = 0,
                            camera_grads: bool = True):
    """render_pixels_deferred with the per-view projection INSIDE the
    core: verts [V, 3] rest positions, mats [B, 4, 4] row-vector
    view-projection matrices (w2c @ proj, transposed convention as in
    optim.ham.project_verts). The corner gather and the backward vertex
    reduction become B-independent ([3F, 4]-row tables instead of
    [3F, B*4]). Differentiable in verts, mats, and attr.

    layout="tiled" keeps the kernel's [B, T, r, P] tile layout end to
    end (no untile/retile transposes) and returns the dict of
    `_finalize_deferred_tiled` — the training-loss fast path.
    """
    H, W = resolution
    C = attr.shape[-1]
    compact_out = layout == "compact"
    tiled = layout in ("tiled", "compact")
    core = get_deferred_core(topo, C, H, W,
                             max_span=max_span, global_cap=global_cap,
                             rows_budget=rows_budget, winner_cap=winner_cap,
                             tiles_budget=tiles_budget,
                             shared_attr=attr.ndim == 2,
                             interpret=interpret, projected=True,
                             tiled=tiled,
                             fused=False if compact_out else fused,
                             compact_out=compact_out, cull=cull,
                             camera_grads=camera_grads)
    if mesh is not None and views_axis in mesh.axis_names:
        try:
            from jax import shard_map
        except ImportError:  # pre-0.8 jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        vspec = P(views_axis)
        attr_spec = P() if attr.ndim == 2 else vspec
        pix_spec = vspec if tiled else P(None, views_axis)
        outs = (pix_spec, vspec, vspec) + (
            (vspec,) if compact_out else ())
        sm_kw = dict(mesh=mesh, in_specs=(P(), vspec, attr_spec),
                     out_specs=outs)
        try:
            core = shard_map(core, check_vma=False, **sm_kw)
        except TypeError:  # older jax spelling
            core = shard_map(core, check_rep=False, **sm_kw)
    if compact_out:
        pix, ids, counters, tlist = core(verts, mats, attr)
        return _finalize_deferred_compact(
            pix, ids, topo, C, verts.dtype, with_aa, resolution,
            counters, tlist)
    pix, ids, counters = core(verts, mats, attr)
    if tiled:
        return _finalize_deferred_tiled(pix, ids, topo, C, verts.dtype,
                                        with_aa, resolution, counters)
    return _finalize_deferred(pix, ids, topo, C, verts.dtype, with_aa,
                              aa_budget, counters, with_counters)

def detect_cull_sign(verts, faces, w2cs, projs, tol: float = 1e-3):
    """Host-side auto-detection of a safe back-face culling sign.

    Returns +1 or -1 when ALL of the following hold, else 0 (cull off):

    1. the mesh is CLOSED with CONSISTENT winding: every directed edge
       appears exactly once and every undirected edge exactly twice —
       the precise condition under which the nearest visible face at any
       pixel is front-facing, so culling the opposite screen orientation
       is exact (bit-identical winners);
    2. across every view, the screen-space orientation `d` of
       geometrically front-facing faces (camera-space normal toward the
       eye) has one consistent sign, and back faces the opposite —
       |d|-weighted disagreement below `tol` (near-degenerate slivers
       under the `AREA_EPS` coverage guard cannot affect the render and
       are allowed to disagree).

    The reference's meshes (real MANO) are OPEN at the wrist — interior
    back faces ARE visible through the opening in nvdiffrast too
    (`/root/reference/mesh_sfs_optim.py:142-147` never culls), so this
    returns 0 there and the renderer keeps both orientations. Closed
    meshes (e.g. the watertight synthetic template) get the ~2x pass-A
    pair reduction for free. Caveat: a SELF-INTERSECTING closed mesh can
    expose a back face; detection runs on the start mesh, so extreme
    optimization-time deformations void the exactness (displacements in
    this pipeline are edge-penalty-bounded at ~1e-3 of the hand scale).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    V = int(verts.shape[0])
    # drop degenerate (padding) faces: repeated vertex ids
    nondeg = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
              & (faces[:, 0] != faces[:, 2]))
    f = faces[nondeg]
    if f.shape[0] == 0:
        return 0
    # 1. closed + consistent winding
    de = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    dkey = de[:, 0] * V + de[:, 1]
    if np.unique(dkey).size != dkey.size:
        return 0  # a directed edge repeats -> inconsistent winding
    ukey = np.minimum(de[:, 0], de[:, 1]) * V + np.maximum(de[:, 0],
                                                           de[:, 1])
    _, cnt = np.unique(ukey, return_counts=True)
    if not np.all(cnt == 2):
        return 0  # boundary or non-manifold edge -> open mesh
    # 2. per-view orientation vote
    w2cs = np.asarray(w2cs, np.float64)
    projs = np.asarray(projs, np.float64)
    vh = np.concatenate([verts, np.ones((V, 1))], axis=1)
    sign = 0
    for b in range(w2cs.shape[0]):
        cam = vh @ w2cs[b]                      # row-vector convention
        clip = cam @ projs[b]
        tri_c = cam[:, :3][f]                   # [F, 3, 3] camera space
        n = np.cross(tri_c[:, 1] - tri_c[:, 0], tri_c[:, 2] - tri_c[:, 0])
        front = np.einsum("fi,fi->f", n, tri_c.mean(axis=1)) < 0
        w = clip[:, 3][f]                       # [F, 3]
        ok = np.all(w > W_EPS, axis=1)
        sx = clip[:, 0][f] / np.where(np.abs(w) > W_EPS, w, W_EPS)
        sy = clip[:, 1][f] / np.where(np.abs(w) > W_EPS, w, W_EPS)
        d = ((sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0])
             - (sx[:, 2] - sx[:, 0]) * (sy[:, 1] - sy[:, 0]))
        # |d|-weighted vote: front faces vote sign(d), back faces -sign(d)
        vote = np.where(front, d, -d)[ok]
        total = np.abs(vote).sum()
        if total <= 0:
            continue
        s = 1 if vote.sum() > 0 else -1
        bad = np.abs(vote[np.sign(vote) == -s]).sum() / total
        if bad > tol:
            return 0
        if sign and s != sign:
            return 0
        sign = s
    return int(sign)
