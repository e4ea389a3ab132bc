"""CLI: train + evaluate the mesh-based neural renderer on one scan.

Parity: `python neural_render.py --conf conf/demo_sfs.conf --scan_id N
--data_path ./demo_data --net_type mlp` (`/root/reference/neural_render.py`,
`README.md:57`): loads the HAM stage outputs (`<out>/demo_sfs/<scan>/
<scan>.obj` + `.npz|.pt`), trains the two-phase renderer, writes
checkpoints + `final_<scan>.obj`, then evaluates PSNR/SSIM (+ reference
PSNR formula) and render fps.
"""

from __future__ import annotations

import argparse
import os
import time
from os.path import join

from ._common import platform_arg, apply_platform


def train_and_eval(conf_path: str, scan_id: int, data_path: str,
                   net_type: str = "mlp", num_epochs: int | None = None,
                   res_override=None):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import cv2

    from ..utils.config import load_config
    from ..utils.obj_io import load_obj, save_obj
    from ..utils.artifacts import load_ham_out
    from ..utils.metrics import psnr, psnr_reference, ssim
    from ..data import load_demo_views
    from ..optim.neural import train_neural_renderer, neural_forward

    conf = load_config(conf_path)
    w = conf.get_int("w"); h = conf.get_int("h")
    if res_override:
        w, h = res_override
    num = conf.get_int("num")
    out_path = data_path.rstrip("/").split("/")[-1].replace("data", "out")
    in_dir = join(out_path, conf.get_string("out_mesh_dire", "demo_sfs"),
                  str(scan_id))

    views = load_demo_views(data_path, scan_id, num=num, res=(w, h),
                            with_mask=False, return_ray=True)
    imgs = views.imgs[..., ::-1]  # BGR -> RGB (`neural_render.py:87` flip(3))

    verts, faces = load_obj(join(in_dir, f"{scan_id}.obj"))
    ham_path = join(in_dir, f"{scan_id}.npz")
    if not os.path.exists(ham_path):
        ham_path = join(in_dir, f"{scan_id}.pt")
    ham = load_ham_out(ham_path)
    albedo = np.asarray(ham["albedo"]).reshape(-1, 3)[: verts.shape[0]]

    epochs = num_epochs if num_epochs is not None else 200
    state, l1, l2, (net, net_g, pe) = train_neural_renderer(
        imgs, views.masks, views.rays, views.w2cs, views.projs,
        verts, faces, albedo, num_epochs=epochs, batch=2,
    )

    ckpt_dir = join(in_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    import pickle
    with open(join(ckpt_dir, f"{net_type}_{scan_id}_{epochs}.pkl"), "wb") as f:
        pickle.dump({
            "net": jax.device_get(state.net_params),
            "net_g": jax.device_get(state.net_g_params),
            "vertex_feature": np.asarray(state.vertex_feat),
        }, f)
    save_obj(join(in_dir, f"final_{scan_id}.obj"),
             np.asarray(state.vertices), faces)

    # ---------------- eval (`neural_render.py:223-321`) -------------------
    os.makedirs(join(in_dir, "rerender"), exist_ok=True)
    faces_j = jnp.asarray(faces)
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def render_one(ray, w2c, proj, rng):
        return neural_forward(
            lambda p, x: net.apply(p, x), state.net_params, pe,
            ray, w2c, proj, state.vertices, faces_j, state.albedo,
            state.vertex_feat, (h, w), rng,
        )

    psnrs, ssims, ref_psnrs = [], [], []
    infer_time = 0.0
    for k in range(num):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        pred, masks = render_one(
            jnp.asarray(views.rays[k:k+1]), jnp.asarray(views.w2cs[k:k+1]),
            jnp.asarray(views.projs[k:k+1]), sub,
        )
        pred = jax.block_until_ready(pred * masks)
        infer_time += time.perf_counter() - t0
        m = np.asarray(masks[0])
        gt = imgs[k] * m
        pr = np.asarray(pred[0])
        psnrs.append(psnr(gt, pr))
        ref_psnrs.append(psnr_reference(gt, pr, m))
        ssims.append(ssim(gt, pr))
        cv2.imwrite(join(in_dir, "rerender", f"nr_{scan_id}_{k:02d}.png"),
                    (pr[..., ::-1] * 255).clip(0, 255).astype(np.uint8))

    print(f"render ave: PSNR {np.mean(psnrs):.3f} dB | "
          f"refPSNR {np.mean(ref_psnrs):.3f} | SSIM {np.mean(ssims):.4f}")
    print(f"render fps: {num / infer_time:.2f}")
    return state, dict(psnr=float(np.mean(psnrs)), ssim=float(np.mean(ssims)),
                       fps=num / infer_time)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", type=str, default="conf/demo_sfs.conf")
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--data_path", type=str, required=True)
    ap.add_argument("--net_type", type=str, default="mlp")
    ap.add_argument("--num_epoch", type=int, default=None)
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    train_and_eval(args.conf, args.scan_id, args.data_path, args.net_type,
                   args.num_epoch)
