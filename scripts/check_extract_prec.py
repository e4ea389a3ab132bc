"""On-chip bit-identity check of the one-hot-selection matmul precision
(FMHR_EXTRACT_PREC high vs highest): renders the prod scene through the
compact training layout in a SUBPROCESS per precision (module constants
bake at import) and compares outputs bit-for-bit and gradients to fp
tolerance. Run on the TPU."""
from __future__ import annotations

import json
import os
import subprocess
import sys

_WORKER = r"""
import os, sys, json
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.environ["FMHR_REPO"])
cache = os.path.join(os.environ["FMHR_REPO"], ".jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.block_until_ready(jnp.ones((8, 128)).sum())
from bench import PRESETS
from fmhr_tpu.data.synthetic import hand_scene
from fmhr_tpu.optim.ham import project_verts
from fmhr_tpu.raster import render_scene, AATopology
from fmhr_tpu.raster.deferred import (audit_deferred_rows,
                                      audit_active_tiles,
                                      audit_global_chunks)
((H, W), n_views, subdiv, two, br, _i, fill) = PRESETS["prod"]
verts, faces, w2cs, projs = hand_scene(res=(H, W), n_views=4,
                                       subdiv=subdiv, two_hands=two,
                                       base_refine=br, fill=fill)
w2cs, projs = w2cs[:4], projs[:4]
clip = project_verts(jnp.asarray(verts), jnp.asarray(w2cs),
                     jnp.asarray(projs))
_, rows_b = audit_deferred_rows(clip, faces, (H, W))
_, tiles_b = audit_active_tiles(clip, faces, (H, W))
_, g_cap = audit_global_chunks(clip, faces, (H, W))
topo_aa = AATopology.build(faces, verts.shape[0])
rng = np.random.default_rng(0)
attr = jnp.asarray(np.concatenate(
    [rng.standard_normal((verts.shape[0], 6)).astype(np.float32),
     np.ones((verts.shape[0], 1), np.float32)], -1))
gimg = None

def loss(v, a):
    tr = render_scene(v, faces, jnp.asarray(w2cs), jnp.asarray(projs), a,
                      (H, W), aa_topology=topo_aa, rows_budget=rows_b,
                      tiles_budget=tiles_b, global_cap=g_cap,
                      layout="compact", camera_grads=False)
    return jnp.sum(jnp.abs(tr["feat"])) * 1e-3, (tr["feat"], tr["ids"])

(l, (feat, ids)), g = jax.jit(jax.value_and_grad(
    loss, argnums=(0, 1), has_aux=True))(jnp.asarray(verts), attr)
out = dict(loss=float(l),
           feat_sum=float(jnp.float64(0) + jnp.sum(jnp.abs(feat))),
           ids_hash=int(np.int64(np.asarray(ids)).sum()),
           gv=np.asarray(g[0]), ga=np.asarray(g[1]),
           feat=np.asarray(feat))
np.savez(os.environ["FMHR_OUT"], **out)
print("worker done", flush=True)
"""


def run(prec, out):
    env = dict(os.environ, FMHR_EXTRACT_PREC=prec, FMHR_OUT=out,
               FMHR_REPO=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    subprocess.run([sys.executable, "-c", _WORKER], env=env, check=True)


def main():
    import numpy as np
    run("split3", "/tmp/prec_high.npz")
    run("highest", "/tmp/prec_highest.npz")
    a = np.load("/tmp/prec_high.npz")
    b = np.load("/tmp/prec_highest.npz")
    ids_same = a["ids_hash"] == b["ids_hash"]
    feat_same = np.array_equal(a["feat"], b["feat"])
    gv = np.abs(a["gv"] - b["gv"]).max()
    ga = np.abs(a["ga"] - b["ga"]).max()
    gs = max(np.abs(b["gv"]).max(), 1e-30)
    print(json.dumps(dict(
        ids_identical=bool(ids_same), feat_bit_identical=bool(feat_same),
        grad_v_maxdiff=float(gv), grad_a_maxdiff=float(ga),
        grad_v_scale=float(np.abs(b["gv"]).max()),
        rel=float(gv / gs))))


if __name__ == "__main__":
    main()
