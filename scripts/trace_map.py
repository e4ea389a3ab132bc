"""Op-level device profile WITH source mapping (trace_step + HLO metadata).

Same workload as trace_step.py, but additionally dumps the compiled HLO
and prints, for each top device op, the `op_name`/source metadata of its
root instruction — mapping `fusion.22` back to the JAX source line that
produced it.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    "full": (512, 512, 4, 2, False, 0),
    "ih": (334, 512, 16, 3, False, 1),
}


def build_step(preset):
    import jax
    import jax.numpy as jnp
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import (
        MeshTopology, vertex_normals, safe_normalize, laplacian_smoothing)
    from fmhr_tpu.core.sh import sh_radiance
    from fmhr_tpu.optim.ham import project_verts, _masked_l1
    from fmhr_tpu.raster import apply_antialias, render_scene, AATopology
    from fmhr_tpu.raster.deferred import (
        DeferredTopology, render_pixels_deferred, audit_deferred_rows)

    H, W, n_views, subdiv, two_hands, base_refine = PRESETS[preset]
    verts, faces, w2cs, projs = hand_scene(
        res=(H, W), n_views=n_views, subdiv=subdiv, two_hands=two_hands,
        base_refine=base_refine)
    V = verts.shape[0]
    topo = MeshTopology.build(faces, V)
    topo_d = DeferredTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
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
    _, budget = audit_deferred_rows(clip0, faces_j, (H, W))

    from fmhr_tpu.raster.antialias import apply_antialias_tiled
    from fmhr_tpu.raster.deferred import tile_images

    imgs_t = tile_images(imgs, (H, W))
    masks_t = tile_images(masks, (H, W))
    n_views_ = imgs.shape[0]

    def loss_fn(params):
        # the TILED projected scene path — exactly what optim/ham.py
        # stage B and bench.py run on TPU
        v = verts0 + params["delta"]
        normals = vertex_normals(v, faces_j,
                                 incidence=topo.vert_slot_incidence)
        attr = jnp.concatenate(
            [normals, params["albedo"], jnp.ones_like(v[:, :1])], -1)
        tr = render_scene(
            v, faces_j, w2cs, projs, attr, (H, W),
            aa_topology=topo_aa, rows_budget=budget, layout="tiled")
        feat, aa_w = tr["feat"], tr["aa"]
        nrm = safe_normalize(feat[:, :, :3], axis=2)
        pred_mask = (apply_antialias_tiled(feat[:, :, 6:7], aa_w)[:, :, 0]
                     * tr["grid"]["valid"])
        valid = ((masks_t > 0) & (tr["ids"] > 0)).astype(jnp.float32)
        rad = sh_radiance(params["sh"][:, None, None, :], nrm, 3, axis=2)
        pred = jnp.where(valid[:, :, None] > 0,
                         rad[:, :, None] * feat[:, :, 3:6], 0.0)
        pred = apply_antialias_tiled(pred, aa_w)
        num = jnp.sum(jnp.abs(pred - imgs_t) * valid[:, :, None])
        den = jnp.maximum(jnp.sum(valid) * 3, 1.0)
        return (50.0 * num / den
                + 200.0 * laplacian_smoothing(
                    v, edges, degrees, nbr_incidence=topo.nbr_incidence)
                + jnp.sum((pred_mask - masks_t) ** 2) / (n_views_ * H * W))

    return jax.jit(jax.value_and_grad(loss_fn)), params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="ih", choices=sorted(PRESETS))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.block_until_ready(jnp.ones((8, 128)).sum())

    step, params = build_step(args.preset)

    compiled = step.lower(params).compile()
    hlo = compiled.as_text()
    # index root instructions: "%name = ... metadata={...}"
    meta_by_name = {}
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?([\w.\-]+) = [^\n]*?"
            r"metadata=\{([^}]*)\}", hlo, re.M):
        meta_by_name.setdefault(m.group(1), m.group(2))

    out = step(params)
    jax.block_until_ready(out)

    tdir = tempfile.mkdtemp(prefix="fmhr_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = step(params)
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(
        tdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    durs = collections.Counter()
    counts = collections.Counter()
    pids = {p["pid"]: p.get("args", {}).get("name", "")
            for p in tr["traceEvents"] if p.get("ph") == "M"
            and p.get("name") == "process_name"}
    dev_pids = {pid for pid, name in pids.items() if "TPU" in name
                or "/device" in name}
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        durs[name] += e.get("dur", 0)
        counts[name] += 1
    total = sum(durs.values())
    print(f"total device time (3 steps): {total / 1e3:.2f} ms")
    for name, d in durs.most_common(args.top):
        meta = meta_by_name.get(name.lstrip("%"), "")
        op = ""
        src = ""
        mo = re.search(r'op_name="([^"]*)"', meta)
        if mo:
            op = mo.group(1)
        ms = re.search(r'source_file="([^"]*)"(?:.*?source_line=(\d+))?',
                       meta)
        if ms:
            src = f'{os.path.basename(ms.group(1))}:{ms.group(2) or "?"}'
        print(f"{d / 3e3:9.3f} ms/step x{counts[name] // 3:<3} {name:32s}"
              f" {op[:90]} {src}")

    # ---- grouped summary over ALL ops (incl. the long tail) -----------
    by_src = collections.Counter()
    skip = {n for n in durs if "jit_" in n or n in ("0", "1", "2")}
    for name, d in durs.items():
        if name in skip:
            continue
        meta = meta_by_name.get(name.lstrip("%"), "")
        ms = re.search(r'source_file="([^"]*)"(?:.*?source_line=(\d+))?',
                       meta)
        key = (f'{os.path.basename(ms.group(1))}:{ms.group(2) or "?"}'
               if ms else "(unattributed)")
        by_src[key] += d
    print("\n---- total by source line (all ops) ----")
    for key, d in by_src.most_common(40):
        print(f"{d / 3e3:9.3f} ms/step  {key}")


if __name__ == "__main__":
    main()
