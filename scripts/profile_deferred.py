"""Component timing for the deferred render path on device.

Presets mirror bench.py; `ih` is the production workload geometry
(334x512, 16 views, ~100k faces — `/root/reference/conf/ih_sfs.conf`).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    # (H, W, n_views, subdiv, two_hands, base_refine)
    "full": (512, 512, 4, 2, False, 0),
    "prod": (256, 256, 4, 3, False, 0),
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
    ap.add_argument("--preset", default="full", choices=sorted(PRESETS))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.block_until_ready(jnp.ones((8, 128)).sum())

    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (
        MeshTopology, vertex_normals, safe_normalize, laplacian_smoothing)
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts, _masked_l1
    from fmhr_tpu.raster import apply_antialias
    from fmhr_tpu.raster.deferred import (
        DeferredTopology, render_pixels_deferred, get_deferred_core,
        audit_deferred_rows)

    H, W, n_views, subdiv, two_hands, base_refine = PRESETS[args.preset]
    verts, faces, w2cs, projs = hand_scene(
        res=(H, W), n_views=n_views, subdiv=subdiv, two_hands=two_hands,
        base_refine=base_refine)
    V = verts.shape[0]
    F = int(faces.shape[0])
    topo = MeshTopology.build(faces, V)
    topo_d = DeferredTopology.build(faces, V)
    edges = jnp.asarray(topo.edges)
    degrees = jnp.asarray(topo.degrees)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((n_views, H, W, 3)), jnp.float32)
    masks = jnp.asarray((rng.random((n_views, H, W)) > 0.3).astype(np.float32))
    sh = jnp.asarray(np.tile(
        np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0], np.float32),
        (n_views, 1)))
    w2cs = jnp.asarray(w2cs); projs = jnp.asarray(projs)
    verts0 = jnp.asarray(verts); faces_j = jnp.asarray(faces)
    params = {"delta": jnp.zeros_like(verts0),
              "albedo": jnp.full_like(verts0, 0.5), "sh": sh}

    clip0 = project_verts(verts0, w2cs, projs)
    C = 7
    _, budget = audit_deferred_rows(clip0, faces_j, (H, W))
    core = get_deferred_core(topo_d, C, H, W, rows_budget=budget,
                             shared_attr=True)
    print(f"faces={F} budget={budget}", flush=True)

    def mkattr(params):
        v = verts0 + params["delta"]
        normals = vertex_normals(v, faces_j)
        return jnp.concatenate(
            [normals, params["albedo"], jnp.ones_like(v[:, :1])], -1)

    attr0 = jax.jit(mkattr)(params)
    B = n_views
    gimg = jnp.asarray(rng.standard_normal(
        (14 + C, B, H, W)), jnp.float32)

    t = timeit(jax.jit(lambda c, a: core(c, a)[0]), clip0, attr0)
    print(f"core fwd only                  : {t:8.2f} ms", flush=True)

    def core_sum(c, a, g):
        pix, _ = core(c, a)
        return jnp.sum(pix * g)

    t = timeit(jax.jit(jax.grad(core_sum, argnums=(0, 1))), clip0, attr0,
               gimg)
    print(f"core fwd+bwd (sum loss)        : {t:8.2f} ms", flush=True)

    def render(c, a):
        rast, feat, aa_w = render_pixels_deferred(
            c, a, topo_d, (H, W), rows_budget=budget)
        return rast, feat, aa_w

    t = timeit(jax.jit(render), clip0, attr0)
    print(f"render_pixels_deferred fwd     : {t:8.2f} ms", flush=True)

    def loss_fn(params):
        v = verts0 + params["delta"]
        clip = project_verts(v, w2cs, projs)
        attr = mkattr(params)
        rast, feat, aa_w = render_pixels_deferred(
            clip, attr, topo_d, (H, W), rows_budget=budget)
        nrm = safe_normalize(feat[..., :3])
        pred_mask = apply_antialias(feat[..., 6:7], aa_w)[..., 0]
        valid = ((masks > 0) & (rast[..., 3] > 0)).astype(jnp.float32)
        rad = sh_radiance(params["sh"][:, None, None, :], nrm, 3)
        pred = jnp.where(valid[..., None] > 0,
                         rad[..., None] * feat[..., 3:6], 0.0)
        pred = apply_antialias(pred, aa_w)
        return (50.0 * _masked_l1(pred, imgs, valid)
                + 200.0 * laplacian_smoothing(v, edges, degrees)
                + jnp.mean((pred_mask - masks) ** 2))

    t = timeit(jax.jit(loss_fn), params)
    print(f"full loss fwd                  : {t:8.2f} ms", flush=True)
    t = timeit(jax.jit(jax.value_and_grad(loss_fn)), params)
    print(f"full loss fwd+bwd              : {t:8.2f} ms", flush=True)

    # ---- projected-input core (B-independent gather + MXU projection)
    from fmhr_tpu.raster import render_scene

    def loss_proj(params):
        v = verts0 + params["delta"]
        attr = mkattr(params)
        from fmhr_tpu.raster import AATopology
        rast, feat, aa_w = render_scene(
            v, faces_j, w2cs, projs, attr, (H, W),
            aa_topology=_AA_SENTINEL, rows_budget=budget)
        nrm = safe_normalize(feat[..., :3])
        pred_mask = apply_antialias(feat[..., 6:7], aa_w)[..., 0]
        valid = ((masks > 0) & (rast[..., 3] > 0)).astype(jnp.float32)
        rad = sh_radiance(params["sh"][:, None, None, :], nrm, 3)
        pred = jnp.where(valid[..., None] > 0,
                         rad[..., None] * feat[..., 3:6], 0.0)
        pred = apply_antialias(pred, aa_w)
        return (50.0 * _masked_l1(pred, imgs, valid)
                + 200.0 * laplacian_smoothing(v, edges, degrees)
                + jnp.mean((pred_mask - masks) ** 2))

    _AA_SENTINEL = object()  # any non-None: deferred path ignores it
    t = timeit(jax.jit(loss_proj), params)
    print(f"full loss fwd  (projected)     : {t:8.2f} ms", flush=True)
    t = timeit(jax.jit(jax.value_and_grad(loss_proj)), params)
    print(f"full loss fwd+bwd (projected)  : {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
