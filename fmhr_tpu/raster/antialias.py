"""Analytic silhouette antialiasing with vertex-position gradients.

Equivalent role to nvdiffrast's `antialias`
(`/root/reference/mesh_sfs_optim.py:146-147,274,287`): rasterized ids are
piecewise-constant in vertex positions, so WITHOUT this pass a silhouette
(mask/occlusion boundary) provides no gradient to the geometry. Following
the approach of the "Modular Primitives" paper (nvdiffrast), for every
horizontally/vertically adjacent pixel pair whose triangle ids differ we
locate the visible triangle edge crossing the segment between the two
pixel centers and blend the two colors by the sub-pixel coverage the edge
implies. The crossing position `s` is an analytic function of the
clip-space vertices, so d(image)/d(vertices) is exact at silhouettes.

Blending rule (s in (0,1) measured from pixel p toward pixel q):
  s > 0.5: the p-side surface protrudes past the midpoint into q's cell:
           out_q += (s - 0.5) · (c_p − c_q)
  s < 0.5: p's cell is partially uncovered by its own surface:
           out_p += (0.5 − s) · (c_q − c_p)

Interior (shared) edges between the two triangles are skipped when a
topology is supplied; without topology the color difference across a
shared edge is already ~0 so the correction degrades gracefully.

Layout note (TPU): all math runs on [B, H, W]-shaped component arrays
(structure-of-arrays) — see api.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .geometry import W_EPS
from .api import raster_context

_DENOM_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class AATopology:
    """Per-face edge ids in local edge order k=0:(v0,v1), 1:(v1,v2), 2:(v2,v0)."""

    face_edge_ids: np.ndarray  # [F, 3] int32

    @classmethod
    def build(cls, faces: np.ndarray, num_vertices: int) -> "AATopology":
        faces = np.asarray(faces, np.int64)
        e01 = np.sort(faces[:, [0, 1]], 1)
        e12 = np.sort(faces[:, [1, 2]], 1)
        e20 = np.sort(faces[:, [2, 0]], 1)
        all_e = np.concatenate([e01, e12, e20], 0)
        h = all_e[:, 0] * num_vertices + all_e[:, 1]
        uniq, inv = np.unique(h, return_inverse=True)
        F = faces.shape[0]
        ids = inv.reshape(3, F).T  # columns: (01, 12, 20)
        return cls(face_edge_ids=ids.astype(np.int32))


def _slice_pair(a, axis):
    """(a[..., :-1, ...], a[..., 1:, ...]) along `axis`."""
    n = a.shape[axis]
    return (
        jax.lax.slice_in_dim(a, 0, n - 1, axis=axis),
        jax.lax.slice_in_dim(a, 1, n, axis=axis),
    )


def _side_crossing(su, sv, covered, w_ok, shared_skip, v_c, u_p, u_q):
    """Crossing position of one pixel-side's triangle edges with the
    center segment. su/sv: 3-tuples of [pairs]-shaped corner coords.

    Returns (s, valid)."""
    s_sel = None
    v_sel = None
    for k in range(3):
        a, b = k, (k + 1) % 3
        denom = sv[b] - sv[a]
        safe = jnp.where(jnp.abs(denom) > _DENOM_EPS, denom, _DENOM_EPS)
        t = (v_c - sv[a]) / safe
        u_int = su[a] + t * (su[b] - su[a])
        s = (u_int - u_p) / (u_q - u_p)
        ok = (
            (jnp.abs(denom) > _DENOM_EPS)
            & (t >= 0.0) & (t <= 1.0)
            & (s > 0.0) & (s < 1.0)
            & covered & w_ok
        )
        if shared_skip is not None:
            ok = ok & ~shared_skip[k]
        if s_sel is None:
            s_sel, v_sel = s, ok
        else:
            take_new = ok & ~v_sel
            s_sel = jnp.where(take_new, s, s_sel)
            v_sel = v_sel | ok
    return s_sel, v_sel


def _pair_alphas(su_p, sv_p, su_q, sv_q, cov_p, cov_q, wok_p, wok_q,
                 zw_p, zw_q, idp, idq, e_p, e_q, v_c, u_p, u_q, active):
    """Shared tail of the dense and compact AA paths: crossing search +
    side selection + blend alphas on pair-shaped elementwise arrays.
    ONE implementation on purpose — the compact path's contract is
    bit-identical alphas, so the math must not fork."""
    if e_p is not None:
        both = cov_p & cov_q
        shared_p = [
            both & ((e_p[k] == e_q[0]) | (e_p[k] == e_q[1]) | (e_p[k] == e_q[2]))
            for k in range(3)
        ]
        shared_q = [
            both & ((e_q[k] == e_p[0]) | (e_q[k] == e_p[1]) | (e_q[k] == e_p[2]))
            for k in range(3)
        ]
    else:
        shared_p = shared_q = None

    sP, vP = _side_crossing(su_p, sv_p, cov_p, wok_p, shared_p,
                            v_c, u_p, u_q)
    sQ, vQ = _side_crossing(su_q, sv_q, cov_q, wok_q, shared_q,
                            v_c, u_p, u_q)

    # Depth-tie pairs (e.g. the two surfaces meeting at a silhouette rim)
    # get a DETERMINISTIC side preference by face id instead of an
    # fp-noise-sensitive zw comparison: a 1-ulp zw difference between two
    # numerically different but equivalent render paths must not flip
    # which side's crossing is used.
    tie = 1e-6 * (jnp.abs(zw_p) + jnp.abs(zw_q)) + 1e-12
    near = jnp.abs(zw_p - zw_q) <= tie
    prefer_p = jnp.where(near, idp <= idq, zw_p <= zw_q)
    use_p = vP & (~vQ | prefer_p)
    s = jnp.where(jax.lax.stop_gradient(use_p), sP, sQ)
    valid = jax.lax.stop_gradient(active & (vP | vQ))

    alpha_q = jnp.where(valid, jnp.maximum(s - 0.5, 0.0), 0.0)
    alpha_p = jnp.where(valid, jnp.maximum(0.5 - s, 0.0), 0.0)
    return alpha_p, alpha_q


def _aa_axis_weights(ids, zw, su, sv, w_ok, eids, u_centers, v_centers, axis):
    """One-axis AA weights. su/sv: 3-tuples of [B, H, W] corner screen
    coords along the pair direction (u) and across it (v); `axis` is the
    spatial pair axis (2 = horizontal W-pairs, 1 = vertical H-pairs)."""
    P = lambda a: _slice_pair(a, axis)
    ids_p, ids_q = P(ids)
    zw_p, zw_q = P(zw)
    wok_p, wok_q = P(w_ok)
    su_p, su_q = zip(*(P(a) for a in su))
    sv_p, sv_q = zip(*(P(a) for a in sv))

    covered_p = ids_p > 0
    covered_q = ids_q > 0
    pair_active = (ids_p != ids_q) & (covered_p | covered_q)
    e_p, e_q = (zip(*(P(e) for e in eids)) if eids is not None
                else (None, None))
    if e_p is not None:
        e_p, e_q = list(e_p), list(e_q)

    u_p, u_q = u_centers[:-1], u_centers[1:]
    return _pair_alphas(su_p, sv_p, su_q, sv_q, covered_p, covered_q,
                        wok_p, wok_q, zw_p, zw_q, ids_p, ids_q, e_p, e_q,
                        v_centers, u_p, u_q, pair_active)


def _aa_axis_weights_compact(ids, zw, su, sv, w_ok, eids, u_vals, v_vals,
                             axis, budget):
    """Compact-pair variant of `_aa_axis_weights`: gather the active
    pairs once (static `budget` slots, audit-sized) and run the crossing
    math + its VJP on [budget] vectors instead of dense [B, H, W] grids.
    Bit-identical alphas to the dense path for every pair that fits the
    budget; overflow pairs lose their AA correction (size the budget via
    `audit_aa_pairs` — active pairs are ALL face-id transitions, which at
    subpixel face density scales with covered area, not silhouette
    length; the win is real only for coarse meshes or sparse coverage).

    u_vals/v_vals: 1-D center-coordinate tables (u along the pair axis).
    """
    B, H, W = ids.shape
    if axis == 2:
        ph, pw, qoff = H, W - 1, 1
    else:
        ph, pw, qoff = H - 1, W, W

    ids_p, ids_q = _slice_pair(ids, axis)
    pair_active = (ids_p != ids_q) & ((ids_p > 0) | (ids_q > 0))
    flat = pair_active.reshape(-1)
    n_act = jnp.sum(flat.astype(jnp.int32))
    j = jnp.nonzero(flat, size=budget, fill_value=0)[0]    # pair index
    live = jnp.arange(budget) < n_act

    b = j // (ph * pw)
    rem = j % (ph * pw)
    y = rem // pw
    x = rem % pw
    fp = (b * H + y) * W + x                              # p pixel, full grid
    fq = fp + qoff

    def ga(a, f):
        return a.reshape(-1)[f]

    su_p = tuple(ga(a, fp) for a in su)
    su_q = tuple(ga(a, fq) for a in su)
    sv_p = tuple(ga(a, fp) for a in sv)
    sv_q = tuple(ga(a, fq) for a in sv)
    cov_p = ga(ids, fp) > 0
    cov_q = ga(ids, fq) > 0
    wok_p = ga(w_ok, fp)
    wok_q = ga(w_ok, fq)
    zw_p = ga(zw, fp)
    zw_q = ga(zw, fq)
    idp = ga(ids, fp)
    idq = ga(ids, fq)

    if eids is not None:
        e_p = [ga(e, fp) for e in eids]
        e_q = [ga(e, fq) for e in eids]
    else:
        e_p = e_q = None

    if axis == 2:
        u_p, u_q = u_vals[x], u_vals[x + 1]
        v_c = v_vals[y]
    else:
        u_p, u_q = u_vals[y], u_vals[y + 1]
        v_c = v_vals[x]

    a_p, a_q = _pair_alphas(su_p, sv_p, su_q, sv_q, cov_p, cov_q,
                            wok_p, wok_q, zw_p, zw_q, idp, idq, e_p, e_q,
                            v_c, u_p, u_q, live)

    npair = B * ph * pw
    # padding scatters out of bounds (dropped); indices stay HONESTLY
    # unique (live j are distinct nonzero positions; padding gets
    # distinct OOB slots), keeping the unique_indices promise valid
    pos = jnp.where(live, j, npair + jnp.arange(budget))
    alpha_p = jnp.zeros(npair, a_p.dtype).at[pos].set(
        a_p, mode="drop", unique_indices=True).reshape(B, ph, pw)
    alpha_q = jnp.zeros(npair, a_q.dtype).at[pos].set(
        a_q, mode="drop", unique_indices=True).reshape(B, ph, pw)
    return alpha_p, alpha_q


# ---------------------------------------------------------------------------
# Tiled-layout AA (training-path): pair math directly on the deferred
# renderer's [B, T, P] tile layout (P = tile_h*tile_w pixels, y-major on
# lanes). Within-tile neighbors are lane shifts; cross-tile pairs are
# extracted/placed with static one-hot matmuls (no strided lane ops, no
# relayouts). Alphas are computed by the SAME `_pair_alphas` as the dense
# image path, so the blend math cannot fork.
# ---------------------------------------------------------------------------


def _tile_onehots(tile_h: int, tile_w: int, dtype):
    """Static extraction/placement matrices for tile-boundary pairs.

    E_hi/E_lo [P, tile_h]: one-hot columns selecting the x == tile_w-1 /
    x == 0 lanes (h-axis halo); F_hi/F_lo [P, tile_w]: the y == tile_h-1
    / y == 0 lanes (v-axis halo). a @ E extracts [.., tile_h] boundary
    values; d @ E.T places them back (zeros elsewhere) — both one-hot
    matmuls, exact in f32.
    """
    P = tile_h * tile_w
    j = np.arange(P)
    x, y = j % tile_w, j // tile_w
    e_hi = np.zeros((P, tile_h), np.float32)
    e_lo = np.zeros((P, tile_h), np.float32)
    e_hi[x == tile_w - 1, y[x == tile_w - 1]] = 1.0
    e_lo[x == 0, y[x == 0]] = 1.0
    f_hi = np.zeros((P, tile_w), np.float32)
    f_lo = np.zeros((P, tile_w), np.float32)
    f_hi[y == tile_h - 1, x[y == tile_h - 1]] = 1.0
    f_lo[y == 0, x[y == 0]] = 1.0
    return (jnp.asarray(e_hi, dtype), jnp.asarray(e_lo, dtype),
            jnp.asarray(f_hi, dtype), jnp.asarray(f_lo, dtype))


def _ext(a, E):
    """Extract boundary lanes: [.., P] f32 @ [P, K] one-hot -> [.., K]."""
    return jax.lax.dot_general(
        a, E, (((a.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def antialias_weights_tiled(comp, grid):
    """AA blend weights on the tiled layout.

    comp: dict with [B, T, P] component arrays — "ids" (int32), "zw",
    "w_ok" (bool), "sx"/"sy" (3-tuples), "eids" (3-tuple int32).
    grid: dict from the deferred renderer — "u"/"v" [T, P] NDC pixel
    centers, "valid" [T, P] bool (inside the un-padded H x W), "tiles_x",
    "tiles_y", "tile_h", "tile_w".

    Covers exactly the image-layout pair set: within-tile lane-shift
    pairs plus tile-boundary halo pairs (roll of the SMALL extracted
    arrays along T); pairs touching the right/bottom padding are masked
    by `valid`. Returns weights for `apply_antialias_tiled`.
    """
    th, tw = grid["tile_h"], grid["tile_w"]
    tiles_x, tiles_y = grid["tiles_x"], grid["tiles_y"]
    T = tiles_x * tiles_y
    P = th * tw
    dtype = comp["zw"].dtype
    E_hi, E_lo, F_hi, F_lo = _tile_onehots(th, tw, dtype)
    j = np.arange(P)
    x_in = jnp.asarray(j % tw)
    y_in = jnp.asarray(j // tw)
    t_ar = np.arange(T)
    tx_ok = jnp.asarray(t_ar % tiles_x < tiles_x - 1)[:, None]  # [T, 1]
    ty_ok = jnp.asarray(t_ar // tiles_x < tiles_y - 1)[:, None]
    valid = grid["valid"]

    ids_f = comp["ids"].astype(dtype)
    valid_f = valid.astype(dtype)
    wok_f = comp["w_ok"].astype(dtype)

    def axis_weights(axis):
        if axis == "h":
            shift, in_mask = 1, x_in < tw - 1
            su, sv = comp["sx"], comp["sy"]
            u_c, v_c = grid["u"], grid["v"]
            E_p, E_q, t_roll, edge_ok = E_hi, E_lo, 1, tx_ok
        else:
            shift, in_mask = tw, y_in < th - 1
            su, sv = comp["sy"], comp["sx"]
            u_c, v_c = grid["v"], grid["u"]
            E_p, E_q, t_roll, edge_ok = F_hi, F_lo, tiles_x, ty_ok

        def q_of(a):
            return jnp.roll(a, -shift, axis=-1)

        # ---- interior pairs: p = every lane, q = lane + shift ----------
        ids_q = q_of(comp["ids"])
        cov_p = comp["ids"] > 0
        cov_q = ids_q > 0
        geom = in_mask & valid & q_of(valid)
        active = (comp["ids"] != ids_q) & (cov_p | cov_q) & geom
        a_p, a_q = _pair_alphas(
            tuple(su), tuple(sv),
            tuple(q_of(a) for a in su), tuple(q_of(a) for a in sv),
            cov_p, cov_q, comp["w_ok"], q_of(comp["w_ok"]),
            comp["zw"], q_of(comp["zw"]), comp["ids"], ids_q,
            list(comp["eids"]), [q_of(e) for e in comp["eids"]],
            v_c, u_c, q_of(u_c), active)

        # ---- boundary pairs: p = last line of tile t, q = first line of
        # the adjacent tile (one-hot extraction, small-array T-roll) ----
        def bq(a):
            # roll along the T axis: [B, T, K] -> axis 1, [T, K] -> axis 0
            return jnp.roll(a, -t_roll, axis=a.ndim - 2)

        def ep(a):
            return _ext(a, E_p)

        def eq(a):
            return bq(_ext(a, E_q))

        idp_b = ep(ids_f)
        idq_b = eq(ids_f)
        covp_b = idp_b > 0.5
        covq_b = idq_b > 0.5
        geom_b = ((ep(valid_f) > 0.5) & (eq(valid_f) > 0.5)
                  & edge_ok)
        active_b = (idp_b != idq_b) & (covp_b | covq_b) & geom_b
        ab_p, ab_q = _pair_alphas(
            tuple(ep(a) for a in su), tuple(ep(a) for a in sv),
            tuple(eq(a) for a in su), tuple(eq(a) for a in sv),
            covp_b, covq_b, ep(wok_f) > 0.5, eq(wok_f) > 0.5,
            ep(comp["zw"]), eq(comp["zw"]), idp_b, idq_b,
            [ep(e.astype(dtype)) for e in comp["eids"]],
            [eq(e.astype(dtype)) for e in comp["eids"]],
            ep(v_c), ep(u_c), eq(u_c), active_b)
        return (a_p, a_q), (ab_p, ab_q)

    h_int, h_bnd = axis_weights("h")
    v_int, v_bnd = axis_weights("v")
    return {
        "layout": "tiled",
        "h": h_int, "v": v_int, "hb": h_bnd, "vb": v_bnd,
        "_grid": grid,
    }


def apply_antialias_tiled(color, weights):
    """Blend tiled `color` [B, T, C, P] with `antialias_weights_tiled`
    output. Mirrors `apply_antialias` pair-for-pair."""
    grid = weights["_grid"]
    th, tw = grid["tile_h"], grid["tile_w"]
    tiles_x = grid["tiles_x"]
    dtype = color.dtype
    E_hi, E_lo, F_hi, F_lo = _tile_onehots(th, tw, dtype)

    out = color
    for key, shift, E_p, E_q, t_roll in (
            ("h", 1, E_hi, E_lo, 1),
            ("v", tw, F_hi, F_lo, tiles_x)):
        a_p, a_q = weights[key]
        c_q = jnp.roll(color, -shift, axis=-1)
        d_p = a_p[:, :, None] * (c_q - color)
        d_q = a_q[:, :, None] * (color - c_q)       # at pair index p
        out = out + d_p + jnp.roll(d_q, shift, axis=-1)

        ab_p, ab_q = weights[key + "b"]
        c_pb = _ext(color, E_p)                     # [B, T, C, K]
        c_qb = jnp.roll(_ext(color, E_q), -t_roll, axis=1)
        db_p = ab_p[:, :, None] * (c_qb - c_pb)
        db_q = ab_q[:, :, None] * (c_pb - c_qb)
        out = out + _ext(db_p, E_p.T) + _ext(
            jnp.roll(db_q, t_roll, axis=1), E_q.T)
    return out


def _take_rows(a, nbr):
    """Gather compact rows: a [B, TA1, ...], nbr [B, TA1] -> a[b, nbr]."""
    idx = nbr.reshape(nbr.shape + (1,) * (a.ndim - 2))
    return jnp.take_along_axis(a, idx, axis=1)


def antialias_weights_compact(comp, grid):
    """AA blend weights on the COMPACT row layout (active tiles + one
    background sentinel row; `deferred._finalize_deferred_compact`).

    Bit-identical alphas to the dense tiled path for every pair, because
    (a) interior pairs are within-row lane shifts exactly as in the
    tiled path, (b) tile-boundary pairs gather the neighbor row through
    `grid["nbr"]` — an inactive/off-grid neighbor resolves to the
    sentinel row whose values are EXACTLY the zero-filled background of
    the dense layout — and (c) the q-side pixel coordinates/validity are
    recomputed with the same formulas `tile_grid` uses. A covered pixel
    always lies in a bbox-active tile, and an AA bleed past a tile
    boundary implies the face bbox reaches the neighbor tile (the pair
    midpoint IS the tile boundary), so the active-tile set covers every
    pair the dense path would blend.
    """
    th, tw = grid["tile_h"], grid["tile_w"]
    tiles_x, tiles_y = grid["tiles_x"], grid["tiles_y"]
    H, W = grid["H"], grid["W"]
    P = th * tw
    dtype = comp["zw"].dtype
    E_hi, E_lo, F_hi, F_lo = _tile_onehots(th, tw, dtype)
    j = np.arange(P)
    x_in = jnp.asarray(j % tw)
    y_in = jnp.asarray(j // tw)
    valid = grid["valid"]                         # [B, TA1, P]
    tlist = grid["tlist"]
    B, ta_cap = tlist.shape
    tl1 = jnp.concatenate(
        [tlist, jnp.full((B, 1), grid["T"], tlist.dtype)], axis=1)
    real = tl1 < grid["T"]                        # [B, TA1]
    tx = tl1 % tiles_x
    ty = tl1 // tiles_x

    ids_f = comp["ids"].astype(dtype)
    valid_f = valid.astype(dtype)
    wok_f = comp["w_ok"].astype(dtype)

    def axis_weights(axis):
        if axis == "h":
            shift, in_mask = 1, x_in < tw - 1
            su, sv = comp["sx"], comp["sy"]
            u_c, v_c = grid["u"], grid["v"]
            E_p, E_q, nbr = E_hi, E_lo, grid["nbr"]["h"]
            edge_ok = real & (tx < tiles_x - 1)
            # q pixels: x = (tx+1)*tw, y = ty*th + k (k over th lines)
            k = jnp.arange(th, dtype=jnp.int32)[None, None, :]
            qx = ((tx + 1) * tw)[:, :, None]
            qy = (ty * th)[:, :, None] + k
            u_qb = (qx.astype(dtype) + 0.5) * (2.0 / W) - 1.0
            vld_qb = (qx < W) & (qy < H)
        else:
            shift, in_mask = tw, y_in < th - 1
            su, sv = comp["sy"], comp["sx"]
            u_c, v_c = grid["v"], grid["u"]
            E_p, E_q, nbr = F_hi, F_lo, grid["nbr"]["v"]
            edge_ok = real & (ty < tiles_y - 1)
            k = jnp.arange(tw, dtype=jnp.int32)[None, None, :]
            qx = (tx * tw)[:, :, None] + k
            qy = ((ty + 1) * th)[:, :, None]
            u_qb = (qy.astype(dtype) + 0.5) * (2.0 / H) - 1.0
            vld_qb = (qx < W) & (qy < H)

        def q_of(a):
            return jnp.roll(a, -shift, axis=-1)

        # ---- interior pairs: identical to the tiled path -------------
        ids_q = q_of(comp["ids"])
        cov_p = comp["ids"] > 0
        cov_q = ids_q > 0
        geom = in_mask & valid & q_of(valid)
        active = (comp["ids"] != ids_q) & (cov_p | cov_q) & geom
        a_p, a_q = _pair_alphas(
            tuple(su), tuple(sv),
            tuple(q_of(a) for a in su), tuple(q_of(a) for a in sv),
            cov_p, cov_q, comp["w_ok"], q_of(comp["w_ok"]),
            comp["zw"], q_of(comp["zw"]), comp["ids"], ids_q,
            list(comp["eids"]), [q_of(e) for e in comp["eids"]],
            v_c, u_c, q_of(u_c), active)

        # ---- boundary pairs: p = last line of each compact row, q =
        # first line of the neighbor row (gathered via nbr; sentinel =
        # background), q geometry recomputed with tile_grid's formulas
        def ep(a):
            return _ext(a, E_p)

        def eq(a):
            return _ext(_take_rows(a, nbr), E_q)

        idp_b = ep(ids_f)
        idq_b = eq(ids_f)
        covp_b = idp_b > 0.5
        covq_b = idq_b > 0.5
        geom_b = ((ep(valid_f) > 0.5) & vld_qb & edge_ok[:, :, None])
        active_b = (idp_b != idq_b) & (covp_b | covq_b) & geom_b
        ab_p, ab_q = _pair_alphas(
            tuple(ep(a) for a in su), tuple(ep(a) for a in sv),
            tuple(eq(a) for a in su), tuple(eq(a) for a in sv),
            covp_b, covq_b, ep(wok_f) > 0.5, eq(wok_f) > 0.5,
            ep(comp["zw"]), eq(comp["zw"]), idp_b, idq_b,
            [ep(e.astype(dtype)) for e in comp["eids"]],
            [eq(e.astype(dtype)) for e in comp["eids"]],
            ep(v_c), ep(u_c), u_qb, active_b)
        return (a_p, a_q), (ab_p, ab_q)

    h_int, h_bnd = axis_weights("h")
    v_int, v_bnd = axis_weights("v")
    return {
        "layout": "compact",
        "h": h_int, "v": v_int, "hb": h_bnd, "vb": v_bnd,
        "_grid": grid,
    }


def apply_antialias_compact(color, weights):
    """Blend compact-layout `color` [B, TA1, C, P] with
    `antialias_weights_compact` output. Boundary d_q lands in the
    neighbor row via a scatter-add (sentinel row absorbs and is never
    read by the loss)."""
    grid = weights["_grid"]
    th, tw = grid["tile_h"], grid["tile_w"]
    dtype = color.dtype
    E_hi, E_lo, F_hi, F_lo = _tile_onehots(th, tw, dtype)
    B, TA1 = color.shape[:2]
    bi = jnp.arange(B)[:, None]

    out = color
    for key, shift, E_p, E_q, nbr in (
            ("h", 1, E_hi, E_lo, grid["nbr"]["h"]),
            ("v", tw, F_hi, F_lo, grid["nbr"]["v"])):
        a_p, a_q = weights[key]
        c_q = jnp.roll(color, -shift, axis=-1)
        d_p = a_p[:, :, None] * (c_q - color)
        d_q = a_q[:, :, None] * (color - c_q)       # at pair index p
        out = out + d_p + jnp.roll(d_q, shift, axis=-1)

        ab_p, ab_q = weights[key + "b"]
        c_pb = _ext(color, E_p)                     # [B, TA1, C, K]
        c_qb = _ext(_take_rows(color, nbr), E_q)
        db_p = ab_p[:, :, None] * (c_qb - c_pb)
        db_q = ab_q[:, :, None] * (c_pb - c_qb)
        out = out + _ext(db_p, E_p.T)
        out = out.at[bi, nbr].add(_ext(db_q, E_q.T))
    return out


def audit_aa_pairs(ids) -> tuple[int, int]:
    """Active AA pair counts (horizontal, vertical) of a concrete id map
    [B, H, W] — for sizing `antialias_weights(budget=...)`. Counts every
    face-id transition (the compact path's gather set), NOT just the
    silhouette. Run at scene setup; coverage is stable through
    optimization, so a ~2x margin makes the static budget safe."""
    ids = np.asarray(ids)

    def count(axis):
        p, q = (ids[:, :, :-1], ids[:, :, 1:]) if axis == 2 else (
            ids[:, :-1, :], ids[:, 1:, :])
        return int(np.sum((p != q) & ((p > 0) | (q > 0))))

    return count(2), count(1)


def antialias_weights(rast, clip, faces, topology: AATopology | None = None,
                      context=None, budget=None):
    """Geometry-only AA pass: blend weights for both pair axes.

    The weights depend only on (rast, clip, topology); computing them once
    and applying to several color buffers (mask + shaded image in HAM
    Stage B) halves the dominant cost. Pass `context` from
    `api.raster_context` to reuse the triangle gather the barycentric
    phase already paid for. Differentiable in `clip`.

    `budget` (int or (h, v) ints, from `audit_aa_pairs` with margin)
    switches to the compact-pair path: crossings and their VJP run on
    [budget] silhouette-pair vectors instead of dense pixel grids.

    Returns an opaque dict for `apply_antialias`.
    """
    B, H, W = rast.shape[:3]
    dtype = rast.dtype
    ids = rast[..., 3].astype(jnp.int32)
    zw = rast[..., 2]

    ctx = context if context is not None else raster_context(ids, clip, faces)
    sx, sy = tuple(ctx["sx"]), tuple(ctx["sy"])
    w_ok = ctx["w_ok"]
    face_idx = ctx["face_idx"]

    if context is not None and context.get("eids") is not None:
        eids = context["eids"]  # per-pixel edge ids (deferred path)
    elif topology is not None:
        fe = jnp.concatenate(
            [jnp.asarray(topology.face_edge_ids), jnp.full((1, 3), -1, jnp.int32)]
        )
        eids = tuple(fe[:, k][face_idx] for k in range(3))
    else:
        eids = None

    px = (jnp.arange(W, dtype=dtype) + 0.5) * (2.0 / W) - 1.0
    py = (jnp.arange(H, dtype=dtype) + 0.5) * (2.0 / H) - 1.0

    if budget is not None:
        bh, bv = budget if isinstance(budget, (tuple, list)) else (
            budget, budget)
        h_p, h_q = _aa_axis_weights_compact(
            ids, zw, sx, sy, w_ok, eids, px, py, axis=2, budget=int(bh))
        v_p, v_q = _aa_axis_weights_compact(
            ids, zw, sy, sx, w_ok, eids, py, px, axis=1, budget=int(bv))
        return {"h": (h_p, h_q), "v": (v_p, v_q)}

    h_p, h_q = _aa_axis_weights(
        ids, zw, sx, sy, w_ok, eids,
        u_centers=px, v_centers=py[None, :, None], axis=2,
    )
    v_p, v_q = _aa_axis_weights(
        ids, zw, sy, sx, w_ok, eids,
        u_centers=py[:, None], v_centers=px[None, None, :], axis=1,
    )
    return {"h": (h_p, h_q), "v": (v_p, v_q)}


def apply_antialias(color, weights):
    """Blend `color` [B, H, W, C] with precomputed AA weights."""
    out = color
    for key, axis in (("h", 2), ("v", 1)):
        alpha_p, alpha_q = weights[key]
        c_p, c_q = _slice_pair(color, axis)
        d_q = alpha_q[..., None] * (c_p - c_q)
        d_p = alpha_p[..., None] * (c_q - c_p)
        if axis == 2:
            out = out.at[:, :, :-1].add(d_p).at[:, :, 1:].add(d_q)
        else:
            out = out.at[:, :-1, :].add(d_p).at[:, 1:, :].add(d_q)
    return out


def antialias(color, rast, clip, faces, topology: AATopology | None = None):
    """Antialias `color` [B, H, W, C] at silhouettes. Differentiable in
    both `color` and `clip`.

    Parity: `dr.antialias(color, rast_out, proj_verts, faces)`.
    """
    return apply_antialias(color, antialias_weights(rast, clip, faces, topology))
