"""Multi-host (2-process) execution test on CPU.

Spawns two REAL processes that form a jax.distributed cluster (gloo CPU
collectives, 2 virtual devices each -> a 4-device global ("views", "rows")
mesh), run 10 sharded HAM Stage-B steps with each process feeding only
its own views (`local_view_slice` + `make_array_from_process_local_data`),
and checks the resulting parameter trajectory against a single-process
single-device run of the identical problem.

This validates the pod entry path of SURVEY §2.3: per-host data loading,
global array assembly, GSPMD gradient psum across processes.
"""

import json
import os
import subprocess
import sys
from os.path import dirname, join

import numpy as np
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out_npz = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from fmhr_tpu.dist.multihost import (
    initialize_from_env, global_render_mesh, local_view_slice,
    shard_batch_multihost)
assert initialize_from_env("localhost:" + port, nproc, pid)
assert jax.process_count() == nproc and len(jax.devices()) == 2 * nproc

import numpy as np
import jax.numpy as jnp
from fmhr_tpu.data.synthetic import hand_scene
from fmhr_tpu.core.mesh import MeshTopology
from fmhr_tpu.raster import AATopology
from fmhr_tpu.optim.ham import HamConfig
from fmhr_tpu.dist import make_sharded_ham_step

res, n_views, steps = 32, 4, 10
verts, faces, w2cs, projs = hand_scene(res=res, n_views=n_views)
V = verts.shape[0]
topo = MeshTopology.build(faces, V)
topo_aa = AATopology.build(faces, V)
cfg = HamConfig(width=res, height=res, batch=n_views,
                sfs_weight=50.0, lap_weight=200.0, mask_weight=10.0,
                edge_weight=5e4, delta_weight=100.0, lr=5e-4,
                albedo_lr=0.01)
rng = np.random.default_rng(0)
imgs = rng.random((n_views, res, res, 3)).astype(np.float32)
masks = (rng.random((n_views, res, res)) > 0.3).astype(np.float32)
sh = np.tile(np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0],
                      np.float32), (n_views, 1))
batch_full = {"imgs": imgs, "masks": masks, "valid_masks": masks,
              "w2cs": np.asarray(w2cs), "projs": np.asarray(projs),
              "sh": sh}

mesh = global_render_mesh(n_row_shards=1)   # views=4 over 2 processes
init_fn, step, shardings = make_sharded_ham_step(
    mesh, verts, faces, topo.edges, topo.degrees, topo_aa,
    jnp.asarray(sh), jnp.asarray(masks), cfg)

# THIS process loads only its own views
sl = local_view_slice(n_views)
local = {k: v[sl] for k, v in batch_full.items()}
batch = shard_batch_multihost(mesh, local, shardings)

params, opt_state = init_fn()
losses = []
for _ in range(steps):
    params, opt_state, loss = step(params, opt_state, batch)
    losses.append(float(loss))

if pid == 0:
    np.savez(out_npz,
             losses=np.asarray(losses),
             delta=np.asarray(params["delta"].addressable_data(0)),
             albedo=np.asarray(params["albedo"].addressable_data(0)))
print(json.dumps({"pid": pid, "done": True}), flush=True)
''' % {"repo": REPO}


@pytest.mark.slow
def test_two_process_matches_single(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    out_npz = str(tmp_path / "proc0.npz")
    port = "29517"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), "2", port, out_npz],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert os.path.exists(out_npz), outs[0][-3000:]
    multi = np.load(out_npz)

    # single-process, single-device reference on the SAME problem
    import jax
    import jax.numpy as jnp
    from fmhr_tpu.data.synthetic import hand_scene
    from fmhr_tpu.core.mesh import MeshTopology
    from fmhr_tpu.raster import AATopology
    from fmhr_tpu.optim.ham import HamConfig
    from fmhr_tpu.dist import make_render_mesh, make_sharded_ham_step

    res, n_views, steps = 32, 4, 10
    verts, faces, w2cs, projs = hand_scene(res=res, n_views=n_views)
    V = verts.shape[0]
    topo = MeshTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
    cfg = HamConfig(width=res, height=res, batch=n_views,
                    sfs_weight=50.0, lap_weight=200.0, mask_weight=10.0,
                    edge_weight=5e4, delta_weight=100.0, lr=5e-4,
                    albedo_lr=0.01)
    rng = np.random.default_rng(0)
    imgs = rng.random((n_views, res, res, 3)).astype(np.float32)
    masks = (rng.random((n_views, res, res)) > 0.3).astype(np.float32)
    sh = np.tile(np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0],
                          np.float32), (n_views, 1))
    mesh = make_render_mesh(1, 1, devices=jax.devices()[:1])
    init_fn, step, shardings = make_sharded_ham_step(
        mesh, verts, faces, topo.edges, topo.degrees, topo_aa,
        jnp.asarray(sh), jnp.asarray(masks), cfg)
    batch_np = {"imgs": imgs, "masks": masks, "valid_masks": masks,
                "w2cs": np.asarray(w2cs), "projs": np.asarray(projs),
                "sh": sh}
    batch = {k: jax.device_put(jnp.asarray(v), shardings[k])
             for k, v in batch_np.items()}
    params, opt_state = init_fn()
    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))

    np.testing.assert_allclose(multi["losses"], np.asarray(losses),
                               rtol=2e-3)
    np.testing.assert_allclose(multi["delta"],
                               np.asarray(params["delta"]),
                               atol=2e-5)
    np.testing.assert_allclose(multi["albedo"],
                               np.asarray(params["albedo"]),
                               atol=2e-4)
