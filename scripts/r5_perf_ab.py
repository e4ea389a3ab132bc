"""Round-5 prod-step cost attribution by whole-program A/B (one TPU
claim, several jitted variants timed back to back).

The per-op profiler returned an empty trace on the tunneled backend this
round (r5_warm2_trace), so attribute cost the robust way: time complete
jitted programs that differ in exactly one stage.

Variants (all on the bench's prod scene, tiled layout, compacted grid):
  fwd_aa      — tiled loss forward, silhouette AA applied
  fwd_noaa    — same loss with the AA stage skipped (weights=None)
  vag_aa      — value_and_grad of fwd_aa  (= the bench step minus Adam)
  vag_noaa    — value_and_grad of fwd_noaa
AA forward cost  = fwd_aa - fwd_noaa
AA fwd+VJP cost  = vag_aa - vag_noaa
backward total   = vag_aa - fwd_aa

Prints one JSON line with all timings (ms).
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
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    if args.platform:
        # NOTE: the env var alone is NOT enough here — a sitecustomize
        # pre-imports jax with the axon plugin before this script runs
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)

    cache_dir = os.environ.get(
        "FMHR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.block_until_ready(jnp.ones((8, 128)).sum())

    from bench import PRESETS
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (
        MeshTopology, vertex_normals, safe_normalize, laplacian_smoothing)
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts
    from fmhr_tpu.raster import render_scene, AATopology
    from fmhr_tpu.raster.antialias import apply_antialias_tiled
    from fmhr_tpu.raster.deferred import (
        audit_deferred_rows, audit_active_tiles, tile_images)

    ((H, W), n_views, subdiv, two_hands, base_refine, iters_unused,
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
    _, rows_budget = audit_deferred_rows(clip, faces_j, (H, W))
    _, tiles_budget = audit_active_tiles(clip, faces_j, (H, W))
    imgs_t = tile_images(imgs, (H, W))
    masks_t = tile_images(masks, (H, W))

    def make_loss(use_aa: bool):
        def loss(params):
            v = verts0 + params["delta"]
            normals = vertex_normals(v, faces_j,
                                     incidence=topo.vert_slot_incidence)
            tr = render_scene(
                v, faces_j, w2cs, projs,
                jnp.concatenate([normals, params["albedo"],
                                 jnp.ones_like(v[:, :1])], -1),
                (H, W), aa_topology=topo_aa if use_aa else None,
                rows_budget=rows_budget, tiles_budget=tiles_budget,
                layout="tiled")
            feat = tr["feat"]
            aa_w = tr["aa"] if use_aa else None
            nrm = safe_normalize(feat[:, :, :3], axis=2)
            pm = feat[:, :, 6:7]
            if use_aa:
                pm = apply_antialias_tiled(pm, aa_w)
            pred_mask = pm[:, :, 0] * tr["grid"]["valid"]
            valid = ((masks_t > 0) & (tr["ids"] > 0)).astype(jnp.float32)
            rad = sh_radiance(sh[:, None, None, :], nrm, 3, axis=2)
            pred = jnp.where(valid[:, :, None] > 0,
                             rad[:, :, None] * feat[:, :, 3:6], 0.0)
            if use_aa:
                pred = apply_antialias_tiled(pred, aa_w)
            num = jnp.sum(jnp.abs(pred - imgs_t) * valid[:, :, None])
            den = jnp.maximum(jnp.sum(valid) * 3.0, 1.0)
            sse = jnp.sum((pred_mask - masks_t) ** 2)
            return (50.0 * num / den + sse / (n_views * H * W)
                    + 200.0 * laplacian_smoothing(
                        v, edges, degrees,
                        nbr_incidence=topo.nbr_incidence))
        return loss

    params = {"delta": jnp.zeros_like(verts0),
              "albedo": jnp.full_like(verts0, 0.5)}

    def chain(fn):
        """iters sequential applications in one jit (scan) — device
        timing like the bench; fn must return a scalar."""
        @jax.jit
        def run(params):
            def body(c, _):
                # perturb delta by the loss value to serialize iterations
                l = fn({"delta": c["delta"], "albedo": c["albedo"]})
                c = {"delta": c["delta"] + 1e-12 * l, "albedo": c["albedo"]}
                return c, l
            return jax.lax.scan(body, params, None, length=args.iters)
        return run

    def timed(name, fn):
        run = chain(fn)
        t0 = time.perf_counter()
        _, ls = run(params)
        np.asarray(jax.device_get(ls))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _, ls = run(params)
            ls = np.asarray(jax.device_get(ls))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        assert np.isfinite(ls).all()
        print(f"[ab] {name}: {best * 1e3:.2f} ms/iter "
              f"(compile+first {compile_s:.1f}s)", file=sys.stderr,
              flush=True)
        return best * 1e3

    out = {}
    loss_aa = make_loss(True)
    loss_noaa = make_loss(False)
    out["fwd_aa"] = timed("fwd_aa", loss_aa)
    out["fwd_noaa"] = timed("fwd_noaa", loss_noaa)
    def vag_scalar(loss):
        def f(p):
            l, g = jax.value_and_grad(loss)(p)
            # 1e-12 (not 0.0): a zero coefficient lets XLA fold the
            # products away and DCE the entire backward pass
            return (l + 1e-12 * g["delta"].sum()
                    + 1e-12 * g["albedo"].sum())
        return f

    out["vag_aa"] = timed("vag_aa", vag_scalar(loss_aa))
    out["vag_noaa"] = timed("vag_noaa", vag_scalar(loss_noaa))
    out["aa_fwd_ms"] = round(out["fwd_aa"] - out["fwd_noaa"], 2)
    out["aa_total_ms"] = round(out["vag_aa"] - out["vag_noaa"], 2)
    out["bwd_ms"] = round(out["vag_aa"] - out["fwd_aa"], 2)
    out = {k: round(v, 2) for k, v in out.items()}
    out["preset"] = args.preset
    print(json.dumps(out))


if __name__ == "__main__":
    main()
