"""Break down the bench HAM step cost on the current device.

Times, separately: visibility ids kernel, fused render fwd (no AA),
fused render fwd (with AA), full loss fwd, full fwd+bwd, plus the
bin-build alone. Run with --preset full|small|prod.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    "full": (512, 4, 2),
    "small": (256, 4, 1),
    "prod": (256, 4, 3),
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
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.block_until_ready(jnp.ones((8, 128)).sum())

    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (
        MeshTopology, vertex_normals, safe_normalize, laplacian_smoothing,
    )
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts, _masked_l1
    from fmhr_tpu.raster import render_pixels, apply_antialias, AATopology
    from fmhr_tpu.raster.api import rasterize_ids, default_capacity
    from fmhr_tpu.raster.visibility import audit_bin_counts

    res, n_views, subdiv = PRESETS[args.preset]
    verts, faces, w2cs, projs = hand_scene(res=res, n_views=n_views, subdiv=subdiv)
    V = verts.shape[0]
    F = int(faces.shape[0])
    topo = MeshTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
    edges = jnp.asarray(topo.edges)
    degrees = jnp.asarray(topo.degrees)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((n_views, res, res, 3)), jnp.float32)
    masks = jnp.asarray((rng.random((n_views, res, res)) > 0.3).astype(np.float32))
    sh = jnp.asarray(np.tile(
        np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0], np.float32),
        (n_views, 1)))
    w2cs = jnp.asarray(w2cs); projs = jnp.asarray(projs)
    verts0 = jnp.asarray(verts); faces_j = jnp.asarray(faces)

    params = {"delta": jnp.zeros_like(verts0),
              "albedo": jnp.full_like(verts0, 0.5), "sh": sh}

    clip0 = project_verts(verts0, w2cs, projs)
    cap = default_capacity(F)
    maxc = audit_bin_counts(clip0, faces_j, res, res)
    print(f"faces={F} verts={V} capacity_default={cap} bin_max={maxc}")
    cap = max(cap, int(np.ceil(max(maxc) / 64) * 64))

    kw = dict(capacity=cap)

    # 1. visibility ids only
    ids_fn = jax.jit(lambda c: rasterize_ids(c, faces_j, (res, res), **kw))
    t_ids = timeit(ids_fn, clip0)
    print(f"visibility ids kernel           : {t_ids:8.2f} ms")

    def fwd_render(params, aa):
        v = verts0 + params["delta"]
        clip = project_verts(v, w2cs, projs)
        normals = vertex_normals(v, faces_j)
        rast, feat, aa_w = render_pixels(
            clip,
            jnp.concatenate([normals, params["albedo"], jnp.ones_like(v[:, :1])], -1),
            faces_j, (res, res), aa_topology=topo_aa if aa else None, **kw)
        return feat if aa_w is None else (feat, aa_w)

    t_noaa = timeit(jax.jit(lambda p: fwd_render(p, False)), params)
    print(f"fwd render (no AA)              : {t_noaa:8.2f} ms")
    t_aa = timeit(jax.jit(lambda p: fwd_render(p, True)), params)
    print(f"fwd render (+AA weights)        : {t_aa:8.2f} ms")

    def loss_fn(params):
        v = verts0 + params["delta"]
        clip = project_verts(v, w2cs, projs)
        normals = vertex_normals(v, faces_j)
        rast, feat, aa_w = render_pixels(
            clip,
            jnp.concatenate([normals, params["albedo"], jnp.ones_like(v[:, :1])], -1),
            faces_j, (res, res), aa_topology=topo_aa, **kw)
        nrm = safe_normalize(feat[..., :3])
        pred_mask = apply_antialias(feat[..., 6:7], aa_w)[..., 0]
        valid = ((masks > 0) & (rast[..., 3] > 0)).astype(jnp.float32)
        rad = sh_radiance(params["sh"][:, None, None, :], nrm, 3)
        pred = jnp.where(valid[..., None] > 0, rad[..., None] * feat[..., 3:6], 0.0)
        pred = apply_antialias(pred, aa_w)
        return (50.0 * _masked_l1(pred, imgs, valid)
                + 200.0 * laplacian_smoothing(v, edges, degrees)
                + jnp.mean((pred_mask - masks) ** 2))

    t_loss = timeit(jax.jit(loss_fn), params)
    print(f"full loss fwd                   : {t_loss:8.2f} ms")

    vg = jax.jit(jax.value_and_grad(loss_fn))
    t_vg = timeit(vg, params)
    print(f"full loss fwd+bwd               : {t_vg:8.2f} ms")

    opt = optax.adam(1e-4)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    p2, s2, l2 = step(params, state)
    jax.block_until_ready(l2)
    t0 = time.perf_counter()
    for _ in range(10):
        p2, s2, l2 = step(p2, s2)
    jax.block_until_ready(l2)
    t_step = (time.perf_counter() - t0) / 10 * 1e3
    print(f"full step (fwd+bwd+adam)        : {t_step:8.2f} ms")
    rays = n_views * res * res
    print(f"Mrays/s = {rays / (t_step / 1e3) / 1e6:.2f}")


if __name__ == "__main__":
    main()
