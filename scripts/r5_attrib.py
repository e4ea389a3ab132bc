"""Round-5 cost attribution of the COMPACT-layout prod step by
whole-program A/B (the per-op profiler returns empty traces on the
tunneled backend, r5_warm2_trace.log).

Each variant is the full jitted scan-chained program differing in
exactly one stage; differences attribute cost:

  step_full   — vag + Adam            (the bench step)
  vag_aa      — value_and_grad of the compact stage-B loss
  vag_noaa    — same without silhouette AA
  fwd_aa      — loss forward only
  fwd_noaa    — forward without AA
  render_grad — grad of sum(feat)+mask terms (kernels fwd+bwd+prep only)
  render_fwd  — forward render only (kernels+prep+compact finalize)
  mesh_only   — laplacian+Adam floor (no render)

  adam          = step_full - vag_aa
  backward      = vag_aa - fwd_aa
  AA fwd / tot  = fwd_aa - fwd_noaa / vag_aa - vag_noaa
  shading fwd   = fwd_noaa - render_fwd
  kernels fwd   = render_fwd  (incl. prep)
  kernels bwd   = render_grad - render_fwd

Prints one JSON line (ms per step).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="prod")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of variants")
    ap.add_argument("--cull", type=int, default=0)
    ap.add_argument("--sum_views", action="store_true",
                    help="camera_grads=False (view-summed bwd table)")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.environ.get(
        "FMHR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.block_until_ready(jnp.ones((8, 128)).sum())
    print("[attrib] device claimed", file=sys.stderr, flush=True)

    from bench import PRESETS
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (
        MeshTopology, vertex_normals, safe_normalize, laplacian_smoothing)
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts
    from fmhr_tpu.raster import render_scene, AATopology
    from fmhr_tpu.raster.antialias import apply_antialias_compact
    from fmhr_tpu.raster.deferred import (
        audit_deferred_rows, audit_active_tiles, audit_global_chunks,
        tile_images, gather_tiles)

    ((H, W), n_views, subdiv, two_hands, base_refine, _iters,
     fill) = PRESETS[args.preset]
    verts, faces, w2cs, projs = hand_scene(
        res=(H, W), n_views=n_views, subdiv=subdiv, two_hands=two_hands,
        base_refine=base_refine, fill=fill)
    V = verts.shape[0]
    topo = MeshTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
    edges = jnp.asarray(topo.edges)
    degrees = jnp.asarray(topo.degrees)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((n_views, H, W, 3)), jnp.float32)
    masks = jnp.asarray(
        (rng.random((n_views, H, W)) > 0.3).astype(np.float32))
    sh = jnp.asarray(np.tile(
        np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0], np.float32),
        (n_views, 1)))
    w2cs = jnp.asarray(w2cs)
    projs = jnp.asarray(projs)
    verts0 = jnp.asarray(verts)
    faces_j = jnp.asarray(faces)
    clip = project_verts(verts0, w2cs, projs)
    _, rows_budget = audit_deferred_rows(clip, faces_j, (H, W),
                                         cull=args.cull)
    _, tiles_budget = audit_active_tiles(clip, faces_j, (H, W),
                                         cull=args.cull)
    _, global_cap = audit_global_chunks(clip, faces_j, (H, W),
                                        cull=args.cull)
    imgs_t = tile_images(imgs, (H, W))
    masks_t = tile_images(masks, (H, W))
    vmask_sq = jnp.sum(masks_t ** 2)
    print(f"[attrib] scene ready rows={rows_budget} tiles={tiles_budget} "
          f"gcap={global_cap}", file=sys.stderr, flush=True)

    def do_render(params, use_aa):
        v = verts0 + params["delta"]
        normals = vertex_normals(v, faces_j,
                                 incidence=topo.vert_slot_incidence)
        return render_scene(
            v, faces_j, w2cs, projs,
            jnp.concatenate([normals, params["albedo"],
                             jnp.ones_like(v[:, :1])], -1),
            (H, W), aa_topology=topo_aa if use_aa else None,
            rows_budget=rows_budget, tiles_budget=tiles_budget,
            global_cap=global_cap, layout="compact", cull=args.cull,
            camera_grads=not args.sum_views)

    def mesh_term(params):
        v = verts0 + params["delta"]
        return 200.0 * laplacian_smoothing(
            v, edges, degrees, nbr_incidence=topo.nbr_incidence)

    def make_loss(use_aa):
        def loss(params):
            tr = do_render(params, use_aa)
            T = tr["grid"]["T"]
            tlist = tr["tlist"]
            imgs_g = gather_tiles(imgs_t, tlist, T)
            masks_g = gather_tiles(masks_t, tlist, T)
            feat = tr["feat"]
            aa_w = tr["aa"] if use_aa else None
            nrm = safe_normalize(feat[:, :, :3], axis=2)
            pm = feat[:, :, 6:7]
            if use_aa:
                pm = apply_antialias_compact(pm, aa_w)
            pred_mask = pm[:, :, 0] * tr["grid"]["valid"]
            valid = ((masks_g > 0) & (tr["ids"] > 0)).astype(feat.dtype)
            rad = sh_radiance(sh[:, None, None, :], nrm, 3, axis=2)
            pred = jnp.where(valid[:, :, None] > 0,
                             rad[:, :, None] * feat[:, :, 3:6], 0.0)
            if use_aa:
                pred = apply_antialias_compact(pred, aa_w)
            num = jnp.sum(jnp.abs(pred - imgs_g) * valid[:, :, None])
            den = jnp.maximum(jnp.sum(valid) * 3.0, 1.0)
            sse = (jnp.sum((pred_mask - masks_g) ** 2 - masks_g ** 2)
                   + vmask_sq)
            return (50.0 * num / den + sse / (n_views * H * W)
                    + mesh_term(params))
        return loss

    def render_sum(params):
        tr = do_render(params, False)
        return (jnp.sum(jnp.abs(tr["feat"]))
                + jnp.sum((tr["ids"] > 0).astype(jnp.float32)))

    def make_loss_nogather():
        """Full shading+loss math but NO image/mask gathers (valid from
        ids only, constant target): isolates gather_tiles cost."""
        def loss(params):
            tr = do_render(params, False)
            feat = tr["feat"]
            nrm = safe_normalize(feat[:, :, :3], axis=2)
            pred_mask = feat[:, :, 6] * tr["grid"]["valid"]
            valid = (tr["ids"] > 0).astype(feat.dtype)
            rad = sh_radiance(sh[:, None, None, :], nrm, 3, axis=2)
            pred = jnp.where(valid[:, :, None] > 0,
                             rad[:, :, None] * feat[:, :, 3:6], 0.0)
            num = jnp.sum(jnp.abs(pred - 0.5) * valid[:, :, None])
            den = jnp.maximum(jnp.sum(valid) * 3.0, 1.0)
            sse = jnp.sum((pred_mask - 0.5) ** 2)
            return (50.0 * num / den + sse / (n_views * H * W)
                    + mesh_term(params))
        return loss

    def make_shade_standalone():
        """The full stage-B loss math on MATERIALIZED render outputs
        (no pallas in the program): isolates the XLA side of the
        kernel/XLA overlap."""
        tr0 = jax.jit(lambda p: do_render(p, True))(params)

        def mat(x):
            return (jax.device_put(np.asarray(x))
                    if hasattr(x, "shape") else x)

        tr0 = {k: ({kk: mat(vv) for kk, vv in v.items()}
                   if isinstance(v, dict) else
                   tuple(mat(x) for x in v) if isinstance(v, tuple)
                   else mat(v))
               for k, v in tr0.items()}

        def loss(p):
            tr = dict(tr0)
            tr["feat"] = tr0["feat"] + 1e-12 * p["delta"][0, 0]
            from fmhr_tpu.optim.ham import stage_b_terms_compact
            m_sel = masks_t
            num, sse, den = stage_b_terms_compact(
                tr, imgs_t, m_sel, m_sel, vmask_sq, sh, 3)
            return (50.0 * num / jnp.maximum(den, 1.0)
                    + sse / (n_views * H * W) + mesh_term(p))
        return loss

    def gather_sum(params):
        """render + the image/mask tile gathers only."""
        tr = do_render(params, False)
        T = tr["grid"]["T"]
        tlist = tr["tlist"]
        imgs_g = gather_tiles(imgs_t, tlist, T)
        masks_g = gather_tiles(masks_t, tlist, T)
        return (jnp.sum(jnp.abs(tr["feat"])) + jnp.sum(imgs_g)
                + jnp.sum(masks_g))

    def prep_sum(params):
        """The deferred prep XLA only: projection, coeff tables, work
        lists, active-tile lists — everything before the first kernel."""
        from fmhr_tpu.raster.deferred import (
            _coeff_table, _build_lists, _plan, default_max_span, _CHUNK,
            W_EPS)
        import math as _math

        v = verts0 + params["delta"]
        F = int(faces_j.shape[0])
        Vn = v.shape[0]
        mats = jnp.einsum("bkl,blm->bkm", w2cs, projs)
        faces_flat = faces_j.reshape(-1)
        vh = jnp.concatenate([v, jnp.ones_like(v[:, :1])], -1)
        tri_rest = vh[faces_flat].reshape(F, 3, 4)
        coords_t = jnp.einsum(
            "fkj,bjc->bckf", tri_rest, mats,
            precision=jax.lax.Precision.HIGHEST).reshape(-1, 12, F)
        ms = default_max_span(F, H, W)
        p = _plan(F, Vn, 7, H, W, ms, global_cap, rows_budget,
                  tiles_budget=tiles_budget, quiet=True)
        tab_a, anchors = jax.vmap(
            lambda ct: _coeff_table(ct, p, H, W, cull=args.cull))(coords_t)
        w_rows = coords_t[:, 9:12]
        iw = 1.0 / jnp.where(jnp.abs(w_rows) > W_EPS, w_rows, W_EPS)
        sx_rows = coords_t[:, 0:3] * iw
        sy_rows = coords_t[:, 3:6] * iw
        lists = jax.vmap(lambda sx, sy, w: _build_lists(
            sx, sy, w, p, H=H, W=W, max_span=ms, cull=args.cull))(
            sx_rows, sy_rows, w_rows)
        return (jnp.sum(tab_a[:, 2]) + jnp.sum(anchors)
                + sum(jnp.sum(x).astype(jnp.float32) for x in lists))

    params = {"delta": jnp.zeros_like(verts0),
              "albedo": jnp.full_like(verts0, 0.5),
              "sh": sh}
    opt = optax.adam(1e-4)
    state0 = opt.init(params)

    def chain_scalar(fn):
        @jax.jit
        def run(params):
            def body(c, _):
                l = fn(c)
                c = jax.tree.map(lambda x: x + 1e-12 * l, c)
                return c, l
            return jax.lax.scan(body, params, None, length=args.iters)
        return run

    def vag_scalar(loss, argnames=("delta", "albedo", "sh")):
        def f(p):
            l, g = jax.value_and_grad(loss)(p)
            acc = l
            for k in argnames:
                acc = acc + 1e-12 * g[k].sum()
            return acc
        return f

    def step_chain():
        loss = make_loss(True)

        @jax.jit
        def run(params):
            def body(c, _):
                p, s = c
                l, g = jax.value_and_grad(loss)(p)
                upd, s = opt.update(g, s)
                return (optax.apply_updates(p, upd), s), l
            (p, s), ls = jax.lax.scan(body, (params, state0), None,
                                      length=args.iters)
            return p, ls
        return run

    def timed(name, run):
        t0 = time.perf_counter()
        out = run(params)
        ls = np.asarray(jax.device_get(out[-1]))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(params)
            ls = np.asarray(jax.device_get(out[-1]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        assert np.isfinite(ls).all(), name
        print(f"[attrib] {name}: {best * 1e3:.2f} ms/iter "
              f"(compile+first {compile_s:.1f}s)", file=sys.stderr,
              flush=True)
        return best * 1e3

    variants = {
        "step_full": step_chain,
        "vag_aa": lambda: chain_scalar(vag_scalar(make_loss(True))),
        "fwd_aa": lambda: chain_scalar(make_loss(True)),
        "vag_noaa": lambda: chain_scalar(vag_scalar(make_loss(False))),
        "fwd_noaa": lambda: chain_scalar(make_loss(False)),
        "render_grad": lambda: chain_scalar(
            vag_scalar(render_sum, ("delta", "albedo"))),
        "render_fwd": lambda: chain_scalar(render_sum),
        "mesh_only": lambda: chain_scalar(
            vag_scalar(mesh_term, ("delta",))),
        "fwd_nogather": lambda: chain_scalar(make_loss_nogather()),
        "shade_standalone": lambda: chain_scalar(make_shade_standalone()),
        "fwd_gatheronly": lambda: chain_scalar(gather_sum),
        "prep_fwd": lambda: chain_scalar(prep_sum),
        "prep_grad": lambda: chain_scalar(
            vag_scalar(prep_sum, ("delta",))),
        "lap_fwd": lambda: chain_scalar(mesh_term),
        "scan_floor": lambda: chain_scalar(
            lambda p: p["delta"][0, 0] + p["albedo"][0, 0]),
    }
    only = set(args.only.split(",")) if args.only else None
    out = {}
    for name, make in variants.items():
        if only and name not in only:
            continue
        out[name] = round(timed(name, make()), 2)

    if not only:
        out["d_adam"] = round(out["step_full"] - out["vag_aa"], 2)
        out["d_bwd"] = round(out["vag_aa"] - out["fwd_aa"], 2)
        out["d_aa_fwd"] = round(out["fwd_aa"] - out["fwd_noaa"], 2)
        out["d_aa_total"] = round(out["vag_aa"] - out["vag_noaa"], 2)
        out["d_shade_fwd"] = round(out["fwd_noaa"] - out["render_fwd"], 2)
        out["d_kern_fwd"] = out["render_fwd"]
        out["d_kern_bwd"] = round(out["render_grad"] - out["render_fwd"], 2)
    out["preset"] = args.preset
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()


