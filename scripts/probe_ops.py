"""Micro-probes for the narrow-channel XLA ops around the deferred core.

Each candidate formulation of (a) the vertex-normal cross products,
(b) the incidence gather-sum, (c) the AA halo extraction is timed on
device at production sizes — pick winners by measurement, not layout
theory. Run on TPU.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.block_until_ready(jnp.ones((8, 128)).sum())

    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import MeshTopology

    verts, faces, _, _ = hand_scene(
        res=(334, 512), n_views=2, subdiv=3, two_hands=False, base_refine=1)
    V, F = verts.shape[0], faces.shape[0]
    topo = MeshTopology.build(faces, V)
    inc = jnp.asarray(topo.vert_slot_incidence)      # [V, 6]
    faces_j = jnp.asarray(faces)
    v_j = jnp.asarray(verts)
    rng = np.random.default_rng(0)
    slots = jnp.asarray(rng.standard_normal((3 * F, 3)), jnp.float32)
    print(f"V={V} F={F} D={inc.shape[1]}", flush=True)

    # ---- (a) cross products: [F, 3] rows vs [3, F] components ----------
    def crosses_rows(v):
        tri = v[faces_j]
        a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
        n0 = jnp.cross(b - a, c - a)
        n1 = jnp.cross(c - b, a - b)
        n2 = jnp.cross(a - c, b - c)
        return jnp.stack([n0, n1, n2], axis=1).reshape(-1, 3)

    def crosses_face(v):
        # one cross per face: all three corner contributions of the
        # pytorch3d formula are the SAME face normal (edge-pair crosses
        # of one triangle), so gather face normals via face incidence
        tri = v[faces_j]
        n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        return jnp.repeat(n, 3, axis=0)  # slot-compat for the check

    def crosses_t(v):
        tri = v[faces_j]                              # [F, 3, 3]
        t = tri.transpose(1, 2, 0)                    # [3c, 3k, F]
        a, b, c = t[0], t[1], t[2]                    # [3, F]

        def cross(u, w):
            return jnp.stack([u[1] * w[2] - u[2] * w[1],
                              u[2] * w[0] - u[0] * w[2],
                              u[0] * w[1] - u[1] * w[0]])

        n0 = cross(b - a, c - a)
        n1 = cross(c - b, a - b)
        n2 = cross(a - c, b - c)
        nt = jnp.stack([n0, n1, n2], axis=0)          # [3k, 3comp, F]
        return nt.transpose(2, 0, 1).reshape(-1, 3)   # [3F, 3]

    ja, jb = jax.jit(crosses_rows), jax.jit(crosses_t)
    jc = jax.jit(crosses_face)
    np.testing.assert_allclose(np.asarray(ja(v_j)), np.asarray(jb(v_j)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ja(v_j)), np.asarray(jc(v_j)),
                               rtol=1e-3, atol=1e-5)
    print(f"crosses rows [F,3] : {timeit(ja, v_j):7.3f} ms", flush=True)
    print(f"crosses comp [3,F] : {timeit(jb, v_j):7.3f} ms", flush=True)
    print(f"crosses 1-per-face : {timeit(jc, v_j):7.3f} ms", flush=True)

    # ---- (b) incidence gather-sum --------------------------------------
    def inc_sum_rows(x):
        xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])
        return xp[inc].sum(axis=1)

    def inc_sum_planes(x):
        xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])
        xt = xp.T                                     # [3, 3F+1]
        return jnp.stack([xt[c][inc].sum(axis=1) for c in range(3)], -1)

    def inc_sum_pad8(x):
        xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])
        xp = jnp.pad(xp, ((0, 0), (0, 5)))
        return xp[inc].sum(axis=1)[:, :3]

    def inc_sum_perD(x):
        xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])
        out = xp[inc[:, 0]]
        for d in range(1, inc.shape[1]):
            out = out + xp[inc[:, d]]
        return out

    fns = {"rows [V,D,3]": inc_sum_rows, "planes 3x[V,D]": inc_sum_planes,
           "pad8 [V,D,8]": inc_sum_pad8, "perD D gathers": inc_sum_perD}
    ref = None
    for name, fn in fns.items():
        jf = jax.jit(fn)
        out = np.asarray(jf(slots))
        if ref is None:
            ref = out
        else:
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        print(f"inc_sum {name:16s}: {timeit(jf, slots):7.3f} ms", flush=True)

    # ---- (c) AA halo extraction ----------------------------------------
    B, T, r, P = 16, 672, 21, 256
    pix = jnp.asarray(rng.standard_normal((B, T, r, P)), jnp.float32)
    E = np.zeros((P, 8), np.float32)
    j = np.arange(P)
    E[(j % 32) == 31, (j // 32)[(j % 32) == 31]] = 1.0
    E_j = jnp.asarray(E)

    def ext_many(pix):
        comps = [pix[:, :, i] for i in range(12)]
        return [jax.lax.dot_general(c, E_j, (((2,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST)
                for c in comps]

    def ext_once(pix):
        out = jax.lax.dot_general(
            pix[:, :, :12], E_j, (((3,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return [out[:, :, i] for i in range(12)]

    def ext_slice(pix):
        # strided lane slice, for comparison
        return [pix[:, :, i, 31::32] for i in range(12)]

    j1, j2, j3 = jax.jit(ext_many), jax.jit(ext_once), jax.jit(ext_slice)
    a1 = np.asarray(j1(pix)[3]); a2 = np.asarray(j2(pix)[3])
    a3 = np.asarray(j3(pix)[3])
    np.testing.assert_allclose(a1, a2, rtol=1e-6)
    np.testing.assert_allclose(a1, a3, rtol=1e-6)
    print(f"halo ext 12 matmuls : {timeit(j1, pix):7.3f} ms", flush=True)
    print(f"halo ext 1 matmul   : {timeit(j2, pix):7.3f} ms", flush=True)
    print(f"halo ext lane slice : {timeit(j3, pix):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
