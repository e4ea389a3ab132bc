"""Compare deferred Pallas render path vs the round-1 XLA path on device.

Checks numerical agreement on the HAM stage-B loss + gradient, then times
both full steps. --preset full|small|prod|ih.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    "full": (512, 512, 4, 2),
    "small": (256, 256, 4, 1),
    "prod": (256, 256, 4, 3),
    "ih": (334, 512, 8, 3),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full", choices=sorted(PRESETS))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-old", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.block_until_ready(jnp.ones((8, 128)).sum())

    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (
        MeshTopology, vertex_normals, safe_normalize, laplacian_smoothing)
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts, _masked_l1
    from fmhr_tpu.raster import render_pixels, apply_antialias, AATopology
    from fmhr_tpu.raster.deferred import DeferredTopology, render_pixels_deferred
    from fmhr_tpu.raster.visibility import audit_bin_counts

    H, W, n_views, subdiv = PRESETS[args.preset]
    res = max(H, W)
    verts, faces, w2cs, projs = hand_scene(res=res, n_views=n_views,
                                           subdiv=subdiv)
    V = verts.shape[0]
    F = int(faces.shape[0])
    topo = MeshTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
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
    t0 = time.perf_counter()
    maxc = max(audit_bin_counts(clip0, faces_j, H, W))
    cap = int(np.ceil(max(128, maxc * 1.25) / 128) * 128)
    print(f"faces={F} verts={V} bin_max={maxc} capacity={cap} "
          f"(audit {time.perf_counter()-t0:.1f}s)", flush=True)

    def loss_core(params, renderer):
        v = verts0 + params["delta"]
        clip = project_verts(v, w2cs, projs)
        normals = vertex_normals(v, faces_j)
        attr = jnp.concatenate(
            [normals, params["albedo"], jnp.ones_like(v[:, :1])], -1)
        rast, feat, aa_w = renderer(clip, attr)
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

    def old_renderer(clip, attr):
        return render_pixels(clip, attr, faces_j, (H, W),
                             aa_topology=topo_aa, capacity=cap)

    def new_renderer(clip, attr):
        return render_pixels_deferred(clip, attr, topo_d, (H, W))

    opt = optax.adam(1e-4)

    def make_step(renderer):
        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(
                lambda p: loss_core(p, renderer))(params)
            upd, state = opt.update(g, state)
            return optax.apply_updates(params, upd), state, loss
        return step

    def time_step(step, params):
        state = opt.init(params)
        p, s, l = step(params, state)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, s, l = step(p, s)
        jax.block_until_ready(l)
        return (time.perf_counter() - t0) / args.iters * 1e3, float(l)

    # numerical agreement of loss + grads
    ln, gn = jax.jit(jax.value_and_grad(
        lambda p: loss_core(p, new_renderer)))(params)
    jax.block_until_ready(ln)
    print(f"deferred loss={float(ln):.6f}", flush=True)
    if not args.skip_old:
        lo, go = jax.jit(jax.value_and_grad(
            lambda p: loss_core(p, old_renderer)))(params)
        jax.block_until_ready(lo)
        print(f"old      loss={float(lo):.6f}", flush=True)
        for k in gn:
            a, b = np.asarray(gn[k]), np.asarray(go[k])
            d = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)
            print(f"grad[{k}] rel-max-diff = {d:.2e}", flush=True)

    t_new, _ = time_step(make_step(new_renderer), params)
    rays = n_views * H * W
    print(f"deferred step: {t_new:8.2f} ms  "
          f"{rays / (t_new / 1e3) / 1e6:7.2f} Mrays/s", flush=True)
    if not args.skip_old:
        t_old, _ = time_step(make_step(old_renderer), params)
        print(f"old      step: {t_old:8.2f} ms  "
              f"{rays / (t_old / 1e3) / 1e6:7.2f} Mrays/s", flush=True)
        print(f"speedup: {t_old / t_new:.2f}x", flush=True)


if __name__ == "__main__":
    main()
