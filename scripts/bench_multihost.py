"""Multi-host scaling-efficiency bench for the sharded training steps.

`--workload ham` (default) measures the GSPMD-sharded HAM Stage-B step;
`--workload nr` measures the sharded neural-renderer phase-1 step
(`dist.make_sharded_nr_step`) — VERDICT r4 #8 asks for both on one
table.

North-star metric (BASELINE.json / SURVEY §2.3): >=80% linear rays/s
scaling at 2 hosts. This script measures aggregate rays/s of the
GSPMD-sharded HAM Stage-B step (`dist.make_sharded_ham_step`) at 1 and
N processes on the SAME per-process device count and prints the ratio.

On a TPU pod, run one copy per host with the TPU runtime providing the
topology (no flags needed; `initialize_from_env` auto-detects). On CPU
this demonstrates the harness with gloo collectives and virtual devices
(`--platform cpu`, default) — numbers there validate the mechanism, not
the hardware claim: host CPU cores are shared between the processes, so
CPU "efficiency" underestimates a pod.

Prints one JSON line:
  {"metric": "2-host scaling efficiency (sharded HAM step)",
   "value": <eff>, "unit": "ratio", ...}
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys, json, time
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
platform = sys.argv[4]; dev_per_proc = int(sys.argv[5])
res_h, res_w, n_views, subdiv, steps = (int(v) for v in sys.argv[6:11])
workload = sys.argv[11]
if platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count="
        + str(dev_per_proc))
sys.path.insert(0, %(repo)r)
import jax
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
from fmhr_tpu.dist.multihost import (
    initialize_from_env, global_render_mesh, local_view_slice,
    shard_batch_multihost)
if nproc > 1:
    assert initialize_from_env("localhost:" + port, nproc, pid)

import numpy as np
import jax.numpy as jnp
from fmhr_tpu.data.synthetic import hand_scene
from fmhr_tpu.core.mesh import MeshTopology
from fmhr_tpu.raster import AATopology
from fmhr_tpu.optim.ham import HamConfig
from fmhr_tpu.dist import make_sharded_ham_step

verts, faces, w2cs, projs = hand_scene(
    res=(res_h, res_w), n_views=n_views, subdiv=subdiv)
V = verts.shape[0]
topo = MeshTopology.build(faces, V)
topo_aa = AATopology.build(faces, V)
cfg = HamConfig(width=res_w, height=res_h, batch=n_views,
                sfs_weight=50.0, lap_weight=200.0, mask_weight=10.0,
                edge_weight=5e4, delta_weight=100.0, lr=5e-4,
                albedo_lr=0.01)
rng = np.random.default_rng(0)
imgs = rng.random((n_views, res_h, res_w, 3)).astype(np.float32)
masks = (rng.random((n_views, res_h, res_w)) > 0.3).astype(np.float32)
sh = np.tile(np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0],
                      np.float32), (n_views, 1))
batch_full = {"imgs": imgs, "masks": masks, "valid_masks": masks,
              "w2cs": np.asarray(w2cs), "projs": np.asarray(projs),
              "sh": sh}

mesh = global_render_mesh(n_row_shards=1)
if workload == "nr":
    from fmhr_tpu.dist import make_sharded_nr_step

    rays = rng.random((n_views, res_h, res_w, 3)).astype(np.float32)
    init_fn, nr_step, shardings = make_sharded_nr_step(
        mesh, verts, faces, np.full_like(verts, 0.5), (res_h, res_w))
    sl = local_view_slice(n_views)
    local = {k: v[sl] for k, v in
             {"imgs": imgs, "masks": masks, "rays": rays,
              "w2cs": np.asarray(w2cs), "projs": np.asarray(projs)}.items()}
    batch = shard_batch_multihost(mesh, local, shardings)
    key = jax.random.PRNGKey(0)
    params, opt_state = init_fn()
    params, opt_state, loss = nr_step(params, opt_state, batch, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = nr_step(params, opt_state, batch, key)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"pid": pid, "step_s": dt,
                      "rays_per_s": n_views * res_h * res_w / dt}),
          flush=True)
    sys.exit(0)

init_fn, step, shardings = make_sharded_ham_step(
    mesh, verts, faces, topo.edges, topo.degrees, topo_aa,
    jnp.asarray(sh), jnp.asarray(masks), cfg,
    vert_slot_incidence=topo.vert_slot_incidence,
    nbr_incidence=topo.nbr_incidence)

sl = local_view_slice(n_views)
local = {k: v[sl] for k, v in batch_full.items()}
batch = shard_batch_multihost(mesh, local, shardings)

params, opt_state = init_fn()
params, opt_state, loss = step(params, opt_state, batch)  # compile
jax.block_until_ready(loss)
t0 = time.perf_counter()
for _ in range(steps):
    params, opt_state, loss = step(params, opt_state, batch)
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / steps
print(json.dumps({"pid": pid, "step_s": dt,
                  "rays_per_s": n_views * res_h * res_w / dt}), flush=True)
''' % {"repo": REPO}


def run_cluster(nproc, platform, dev_per_proc, shape, steps, port):
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        worker = os.path.join(td, "worker.py")
        with open(worker, "w") as f:
            f.write(WORKER)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        argv_tail = [platform, str(dev_per_proc)] + [
            str(v) for v in shape[:4]] + [str(steps), shape[4]]
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), str(nproc), port]
                + argv_tail,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=td)
            for i in range(nproc)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=1200)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        for p, out in zip(procs, outs):
            if p.returncode != 0:
                sys.stderr.write(out[-3000:] + "\n")
                raise RuntimeError(f"worker failed (nproc={nproc})")
        stats = [json.loads(ln) for out in outs for ln in out.splitlines()
                 if ln.startswith("{")]
        # aggregate throughput: whole-cluster rays per wall second (all
        # processes step in lockstep; use the slowest)
        step_s = max(s["step_s"] for s in stats)
        return shape[2] * shape[0] * shape[1] / step_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices_per_process", type=int, default=2)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--res", type=int, nargs=2, default=(64, 64))
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--subdiv", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--workload", default="ham", choices=["ham", "nr"])
    args = ap.parse_args()

    shape = (args.res[0], args.res[1], args.views, args.subdiv,
             args.workload)
    r1 = run_cluster(1, args.platform, args.devices_per_process, shape,
                     args.steps, "29531")
    rn = run_cluster(args.processes, args.platform,
                     args.devices_per_process, shape, args.steps, "29532")
    # linear target: N processes = N x the single-process device count
    eff = rn / (r1 * args.processes)
    print(json.dumps({
        "metric": f"{args.processes}-host scaling efficiency "
                  f"(sharded {args.workload.upper()} step)",
        "value": round(eff, 4),
        "unit": "ratio",
        "vs_baseline": round(eff / 0.8, 4),  # >=1.0 meets the 80% bar
        "extra": {
            "rays_per_s_1proc": round(r1, 1),
            f"rays_per_s_{args.processes}proc": round(rn, 1),
            "platform": args.platform,
            "devices_per_process": args.devices_per_process,
            "note": ("CPU runs validate the harness; host cores are "
                     "shared so efficiency there underestimates a pod"
                     if args.platform == "cpu" else ""),
        },
    }))


if __name__ == "__main__":
    main()
