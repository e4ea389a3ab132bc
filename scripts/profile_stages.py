"""Stage-level device timing of the deferred core (finer than
profile_deferred.py): times each internal stage of `_fwd_impl` /
`_bwd_gtab` separately — coords gather, record-table build, coeff table,
list build, pass A, winner compaction, pass B, output transpose, and the
backward kernel + reductions. Each stage is its own jit over precomputed
device inputs, so per-stage numbers include XLA's per-program overhead
(the fused whole can be faster than the sum).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    "full": (512, 512, 4, 2, False, 0),
    "ih": (334, 512, 16, 3, False, 1),
}


def timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="ih", choices=sorted(PRESETS))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--fill", type=float, default=0.06,
                    help="silhouette coverage fraction (matches bench presets); 0 = legacy wide framing")
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.block_until_ready(jnp.ones((8, 128)).sum())

    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.optim.ham import project_verts
    from fmhr_tpu.raster import deferred as D

    H, W, n_views, subdiv, two_hands, base_refine = PRESETS[args.preset]
    verts, faces, w2cs, projs = hand_scene(
        res=(H, W), n_views=n_views, subdiv=subdiv, two_hands=two_hands,
        base_refine=base_refine, fill=args.fill or None)
    V = verts.shape[0]
    F = int(faces.shape[0])
    topo = D.DeferredTopology.build(faces, V)
    verts0 = jnp.asarray(verts)
    clip0 = project_verts(verts0, jnp.asarray(w2cs), jnp.asarray(projs))
    C = 7
    _, budget = audit = D.audit_deferred_rows(clip0, jnp.asarray(faces), (H, W))
    budget = audit[1]
    max_span = D.default_max_span(F, H, W)
    p = D._plan(F, V, C, H, W, max_span, 64, budget, 128)
    B = n_views
    K = D._CHUNK
    T, nc, Fpad, rec = p["T"], p["nc"], p["Fpad"], p["rec"]
    rows_out, rows_used = p["rows_out"], p["rows_used"]
    print(f"faces={F} budget={budget} T={T} nc={nc} pair_cap={p['pair_cap']}"
          f" wcap={p['wcap']} tile={D.TILE_H}x{D.TILE_W}", flush=True)

    rng = np.random.default_rng(0)
    attr = jnp.asarray(rng.random((V, C)), jnp.float32)

    faces_np = topo.faces
    eids_np = np.asarray(topo.face_edge_ids, np.float32)

    # ---- stage 1: corner gather (coords_t) -------------------------------
    def coords_fn(clip):
        faces_flat = jnp.asarray(faces_np.reshape(-1))
        clip_t = clip.transpose(1, 0, 2).reshape(V, B * 4)
        tri_flat = clip_t[faces_flat].reshape(F, 3, B, 4)
        return tri_flat.transpose(2, 3, 1, 0).reshape(B, 12, F)

    coords_j = jax.jit(coords_fn)
    coords_t = jax.block_until_ready(coords_j(clip0))
    print(f"coords gather          : {timeit(coords_j, clip0):8.2f} ms",
          flush=True)

    # ---- stage 2: record-table build --------------------------------------
    def tables_fn(coords_t, attr):
        at_f = attr[jnp.asarray(faces_np.reshape(-1))].reshape(F, 3, C)
        attr_t = at_f.transpose(1, 2, 0).reshape(1, 3 * C, F)
        tab_dyn = jnp.pad(coords_t, ((0, 0), (0, 4), (0, 0)))
        tab_ids = jnp.concatenate(
            [jnp.asarray(topo.ext_face_ids)[None, None, :],
             jnp.asarray(eids_np.T)[None]], axis=1)
        tab_ids = jnp.pad(tab_ids, ((0, 0), (0, 4), (0, 0)))
        tab_sta = attr_t
        if Fpad > F:
            tab_dyn = jnp.pad(tab_dyn, ((0, 0), (0, 0), (0, Fpad - F)))
            tab_ids = jnp.pad(tab_ids, ((0, 0), (0, 0), (0, Fpad - F)))
            tab_sta = jnp.pad(tab_sta, ((0, 0), (0, 0), (0, Fpad - F)))
        if rec > 24 + 3 * C:
            tab_sta = jnp.pad(
                tab_sta, ((0, 0), (0, rec - 24 - 3 * C), (0, 0)))
        return tab_dyn, tab_ids, tab_sta

    tables_j = jax.jit(tables_fn)
    tab_dyn, tab_ids, tab_sta = jax.block_until_ready(
        tables_j(coords_t, attr))
    print(f"record tables          : {timeit(tables_j, coords_t, attr):8.2f} ms",
          flush=True)

    # ---- stage 3: coeff table ---------------------------------------------
    coeff_j = jax.jit(lambda ct: jax.vmap(
        lambda c: D._coeff_table(c, p, H, W))(ct))
    tab_a, anchors = jax.block_until_ready(coeff_j(coords_t))
    print(f"coeff table (pass-A in): {timeit(coeff_j, coords_t):8.2f} ms",
          flush=True)

    # ---- stage 4: list build ----------------------------------------------
    def lists_fn(coords_t):
        w_rows = coords_t[:, 9:12]
        iw = 1.0 / jnp.where(jnp.abs(w_rows) > D.W_EPS, w_rows, D.W_EPS)
        sx_rows = coords_t[:, 0:3] * iw
        sy_rows = coords_t[:, 3:6] * iw
        chunk_list, starts, ends, g_list, g_cnt, _, _ = jax.vmap(
            lambda sx, sy, w: D._build_lists(
                sx, sy, w, p, H=H, W=W, max_span=max_span)
        )(sx_rows, sy_rows, w_rows)
        meta = jnp.stack(
            [starts, ends,
             jnp.broadcast_to(g_cnt[:, None], (B, T)),
             jnp.zeros((B, T), jnp.int32)], axis=-1)
        return chunk_list, g_list, meta[:, :, None, :]

    lists_j = jax.jit(lists_fn)
    chunk_list, g_list, meta = jax.block_until_ready(lists_j(coords_t))
    print(f"list build             : {timeit(lists_j, coords_t):8.2f} ms",
          flush=True)

    # ---- stage 5: pass A ----------------------------------------------------
    def passa_fn(meta, chunk_list, g_list, anchors, tab_a):
        return pl.pallas_call(
            D._make_passa_kernel(p),
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, p["pair_cap"]), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, p["g_pad"]), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2, nc), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, D._PIX, 1), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, p["wcap"]),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 8), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, T, D._PIX, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, T, 1, p["wcap"]), jnp.int32),
                jax.ShapeDtypeStruct((B, T, 1, 8), jnp.int32),
            ],
        )(meta, chunk_list[:, None], g_list[:, None], anchors, tab_a)

    passa_j = jax.jit(passa_fn)
    slot, wlist4, wstat = jax.block_until_ready(
        passa_j(meta, chunk_list, g_list, anchors, tab_a))
    print(f"pass A (pallas, +winners): "
          f"{timeit(passa_j, meta, chunk_list, g_list, anchors, tab_a):8.2f} ms",
          flush=True)

    wlist = wlist4[:, :, 0]
    wcnt = wstat[:, :, 0, 0]

    def wmeta_fn(wcnt):
        return jnp.stack(
            [wcnt, jnp.zeros_like(wcnt), jnp.zeros_like(wcnt),
             jnp.zeros_like(wcnt)], axis=-1)[:, :, None, :]

    wmeta = jax.jit(wmeta_fn)(wcnt)

    # ---- stage 7: pass B ----------------------------------------------------
    def passb_fn(wmeta, wlist, slot, tab_dyn, tab_ids, tab_sta):
        return pl.pallas_call(
            D._make_passb_kernel(p, C),
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, p["wcap"]),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, D._PIX, 1), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, rows_out, D._PIX),
                                   lambda b, t: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, rows_out, D._PIX),
                                           jnp.float32),
        )(wmeta, wlist[:, :, None], slot, tab_dyn, tab_ids, tab_sta)

    passb_j = jax.jit(passb_fn)
    outf = jax.block_until_ready(
        passb_j(wmeta, wlist, slot, tab_dyn, tab_ids, tab_sta))
    print(f"pass B (pallas)        : "
          f"{timeit(passb_j, wmeta, wlist, slot, tab_dyn, tab_ids, tab_sta):8.2f} ms",
          flush=True)

    # ---- stage 8: output transpose -----------------------------------------
    def untile_fn(outf):
        pix = outf[:, :, :rows_used].reshape(
            B, p["tiles_y"], p["tiles_x"], rows_used, D.TILE_H, D.TILE_W)
        pix = pix.transpose(3, 0, 1, 4, 2, 5).reshape(
            rows_used, B, p["Hp"], p["Wp"])
        return pix[:, :, :H, :W]

    untile_j = jax.jit(untile_fn)
    pix = jax.block_until_ready(untile_j(outf))
    print(f"output untile          : {timeit(untile_j, outf):8.2f} ms",
          flush=True)

    # ---- stage 9: backward kernel -------------------------------------------
    g = jnp.asarray(rng.standard_normal((B, T, rows_out, D._PIX)),
                    jnp.float32)

    def bwd_fn(wmeta, wlist, slot, g, tab_dyn, tab_ids, tab_sta):
        kernel = D._make_bwd_kernel(p, C)
        zeros = jnp.zeros((B, rec, Fpad), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, p["wcap"]),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, D._PIX, 1), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rows_out, D._PIX),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, rec, Fpad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, rec, K), jnp.float32),
                pltpu.VMEM((rec, D._PIX), jnp.float32),
                pltpu.VMEM((2, rec, K), jnp.float32),
                pltpu.VMEM((2, rec, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={7: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(wmeta, wlist[:, :, None], slot, g, tab_dyn, tab_ids, tab_sta,
          zeros)

    bwd_j = jax.jit(bwd_fn)
    gtab = jax.block_until_ready(
        bwd_j(wmeta, wlist, slot, g, tab_dyn, tab_ids, tab_sta))
    print(f"bwd kernel (pallas)    : "
          f"{timeit(bwd_j, wmeta, wlist, slot, g, tab_dyn, tab_ids, tab_sta):8.2f} ms",
          flush=True)

    # ---- stage 10: vertex/attr reductions -----------------------------------
    inc_np = topo.vert_incidence
    def reduce_fn(gtab):
        inc_j = jnp.asarray(inc_np)
        g_attr_t = gtab[:, 24:24 + 3 * C, :F].reshape(B, 3, C, F)
        g_af = g_attr_t.sum(axis=0).transpose(2, 0, 1).reshape(F * 3, C)
        g_af = jnp.concatenate(
            [g_af, jnp.zeros((1, C), g_af.dtype)], axis=0)
        g_attr = g_af[inc_j].sum(axis=1)
        g_coords = gtab[:, :12, :F].reshape(B, 4, 3, F)
        g_coords = g_coords.transpose(3, 2, 0, 1).reshape(F * 3, B * 4)
        g_coords = jnp.concatenate(
            [g_coords, jnp.zeros((1, B * 4), g_coords.dtype)], axis=0)
        g_clip = g_coords[inc_j].sum(axis=1)
        return g_attr, g_clip.reshape(V, B, 4).transpose(1, 0, 2)

    reduce_j = jax.jit(reduce_fn)
    jax.block_until_ready(reduce_j(gtab))
    print(f"bwd reductions         : {timeit(reduce_j, gtab):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
