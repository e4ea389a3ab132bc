"""Component timing for the deferred render path on device."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    "full": (512, 512, 4, 2),
    "prod": (256, 256, 4, 3),
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
        DeferredTopology, render_pixels_deferred, get_deferred_core)
    from fmhr_tpu.raster.visibility import audit_bin_counts

    H, W, n_views, subdiv = PRESETS[args.preset]
    verts, faces, w2cs, projs = hand_scene(res=max(H, W), n_views=n_views,
                                           subdiv=subdiv)
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
    maxc = max(audit_bin_counts(clip0, faces_j, H, W))
    cap = int(np.ceil(max(128, maxc * 1.25) / 128) * 128)
    C = 7
    core = get_deferred_core(topo_d, C, H, W, capacity=cap)
    print(f"faces={F} cap={cap}", flush=True)

    def mkattr(params):
        v = verts0 + params["delta"]
        normals = vertex_normals(v, faces_j)
        return jnp.concatenate(
            [normals, params["albedo"], jnp.ones_like(v[:, :1])], -1)

    attr0 = jax.jit(mkattr)(params)
    B = n_views
    attr0b = jnp.broadcast_to(attr0[None], (B,) + attr0.shape)
    gimg = jnp.asarray(rng.standard_normal(
        (16 + 3 * C, B, H, W)), jnp.float32)

    t = timeit(jax.jit(lambda c, a: core(c, a)[0]), clip0, attr0b)
    print(f"core fwd only                  : {t:8.2f} ms", flush=True)

    def core_sum(c, a):
        comp, _ = core(c, a)
        return jnp.sum(comp * gimg)

    t = timeit(jax.jit(jax.grad(core_sum, argnums=(0, 1))), clip0, attr0b)
    print(f"core fwd+bwd (sum loss)        : {t:8.2f} ms", flush=True)

    def render(c, a):
        rast, feat, aa_w = render_pixels_deferred(
            c, a, topo_d, (H, W), capacity=cap)
        return rast, feat, aa_w

    t = timeit(jax.jit(render), clip0, attr0b)
    print(f"render_pixels_deferred fwd     : {t:8.2f} ms", flush=True)

    def loss_fn(params):
        v = verts0 + params["delta"]
        clip = project_verts(v, w2cs, projs)
        attr = mkattr(params)
        rast, feat, aa_w = render_pixels_deferred(
            clip, attr, topo_d, (H, W), capacity=cap)
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
    profile_build(args.preset)


def profile_build(args_preset="full", platform=None):
    """Granular: time _build_view, record transpose, kernel alone."""
    import jax
    import jax.numpy as jnp
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.optim.ham import project_verts
    from fmhr_tpu.core.mesh import vertex_normals
    from fmhr_tpu.raster.deferred import (
        DeferredTopology, _build_view, _plan)
    from fmhr_tpu.raster.visibility import audit_bin_counts
    import numpy as np

    H, W, n_views, subdiv = PRESETS[args_preset]
    verts, faces, w2cs, projs = hand_scene(res=max(H, W), n_views=n_views,
                                           subdiv=subdiv)
    V = verts.shape[0]; F = int(faces.shape[0])
    topo_d = DeferredTopology.build(faces, V)
    verts0 = jnp.asarray(verts); faces_j = jnp.asarray(faces)
    clip0 = project_verts(verts0, jnp.asarray(w2cs), jnp.asarray(projs))
    maxc = max(audit_bin_counts(clip0, faces_j, H, W))
    cap = int(np.ceil(max(128, maxc * 1.25) / 128) * 128)
    C = 7
    p = _plan(F, V, C, H, W, cap, 8, 64)
    eids_f = jnp.asarray(np.asarray(topo_d.face_edge_ids, np.float32))
    albedo = jnp.full_like(verts0, 0.5)
    normals = vertex_normals(verts0, faces_j)
    attr = jnp.concatenate([normals, albedo, jnp.ones_like(verts0[:, :1])], -1)
    B = n_views
    attr_b = jnp.broadcast_to(attr[None], (B,) + attr.shape)

    @jax.jit
    def build(clip, attrb):
        tri = clip[:, faces_j]
        attr_f = attrb[:, faces_j].reshape(B, F, 3 * C)
        return jax.vmap(lambda t, a: _build_view(
            t, a, eids_f, p, H=H, W=W, capacity=cap, max_span=8,
            global_cap=64))(tri, attr_f)

    t = timeit(build, clip0, attr_b)
    print(f"build_view (records+sort)      : {t:8.2f} ms", flush=True)

    @jax.jit
    def build_sort_only(clip):
        tri = clip[:, faces_j]
        from fmhr_tpu.raster.visibility import _face_tile_ranges
        def one(trib):
            tx0, ty0, span_x, span_y, valid = _face_tile_ranges(
                trib, 8, 128, p["tiles_y"], p["tiles_x"], H, W)
            n_tiles = span_x * span_y
            small = valid & (n_tiles <= 8)
            slots = jnp.arange(8, dtype=jnp.int32)
            dx = slots[None, :] % jnp.maximum(span_x, 1)[:, None]
            dy = slots[None, :] // jnp.maximum(span_x, 1)[:, None]
            live = small[:, None] & (slots[None, :] < n_tiles[:, None])
            tile = (ty0[:, None] + dy) * p["tiles_x"] + (tx0[:, None] + dx)
            tile = jnp.where(live, tile, p["T"])
            face = jnp.broadcast_to(
                jnp.arange(F, dtype=jnp.int32)[:, None], tile.shape)
            return jax.lax.sort_key_val(
                tile.reshape(-1), face.reshape(-1), is_stable=True)
        return jax.vmap(one)(tri)

    t = timeit(build_sort_only, clip0)
    print(f"  pair build + sort only       : {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
