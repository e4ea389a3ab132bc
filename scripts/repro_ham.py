"""Bisect the full-res demo HAM device fault (round 4).

Reconstructs exactly the pipeline's stage-3 inputs (demo_data at
1280x1024, fitted two-hand mesh subdiv-3) and runs run_ham with TINY
epoch counts and FMHR_HAM_SYNC prints, so the faulting computation
(sh_init vs stage A vs stage B) is identified. Flags scale the workload
down to find the breaking dimension.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/repro_ham.py \
        --mesh runs/full1/demo_out/mano_out/1.obj --res_scale 1.0
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FMHR_HAM_SYNC", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default="/root/reference/demo_data")
    ap.add_argument("--mesh", default="runs/full1/demo_out/mano_out/1.obj")
    ap.add_argument("--res_scale", type=float, default=1.0)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
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
    print("[repro] device:", jax.devices()[0], flush=True)

    from fmhr_tpu.data import load_demo_views
    from fmhr_tpu.optim.ham import HamConfig, run_ham
    from fmhr_tpu.core.subdivision import loop_subdivide_iter
    from fmhr_tpu.utils.obj_io import load_obj

    W, H = int(1280 * args.res_scale), int(1024 * args.res_scale)
    print(f"[repro] res {W}x{H}", flush=True)
    views = load_demo_views(args.data_path, 1, num=args.num, res=(W, H))
    verts, faces = load_obj(args.mesh)
    verts, faces = loop_subdivide_iter(
        verts.astype(np.float32), faces.astype(np.int32), args.subdiv)
    print(f"[repro] mesh V={verts.shape[0]} F={faces.shape[0]}", flush=True)

    cfg = HamConfig(
        width=W, height=H,
        epoch_albedo=args.epochs, epoch_sfs=args.epochs,
        sfs_weight=50.0, lap_weight=2000.0, albedo_weight=1.0,
        mask_weight=1000.0, edge_weight=5e5, delta_weight=5e4,
        batch=args.batch, lr=1e-4, albedo_lr=0.005, sh_lr=0.005,
    )
    t0 = time.time()
    out = run_ham(views.imgs, views.grayimgs, views.masks,
                  views.w2cs, views.projs, verts.astype(np.float32),
                  faces.astype(np.int32), cfg)
    la = np.asarray(out["losses_albedo"])
    lb = np.asarray(out["losses_sfs"])
    print(f"[repro] OK in {time.time()-t0:.1f}s: "
          f"A {la[0]:.4f}->{la[-1]:.4f} B {lb[0]:.4f}->{lb[-1]:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
