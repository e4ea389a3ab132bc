"""CLI: train + evaluate the mesh-based neural renderer on one scan.

Parity: `python neural_render.py --conf conf/demo_sfs.conf --scan_id N
--data_path ./demo_data --net_type mlp` (`/root/reference/neural_render.py`,
`README.md:57`): loads the HAM stage outputs (`<out>/demo_sfs/<scan>/
<scan>.obj` + `.npz|.pt`), trains the two-phase renderer (MLP or UNet
head), writes checkpoints + `final_<scan>.obj`, then evaluates
PSNR/SSIM/LPIPS (+ reference PSNR formula) and render fps.

Dispatches on the conf's `data_type` like the reference
(`neural_render.py:76-89`): `demo` trains/evals on the demo capture;
`interhand` trains on an InterHand2.6M frame (masks rasterized by our
own rasterizer) and evaluates on the val-style view set from
`load_interhand_eval_views` (= `get_valinterhand_data`,
`neural_render.py:515-586`). `--holdout_cams` drops cameras from the
TRAINING set only, so the eval reports genuine held-out novel-view
PSNR/SSIM/LPIPS (printed separately).

Extras mirrored from the reference:
- `--continue_train` resumes from the latest checkpoint pickle
  (`neural_render.py:100-106`).
- `--repose_id B` re-animates the trained scan-A avatar to scan B's MANO
  pose via inverse+forward LBS, renders every view, scores
  PSNR/SSIM/LPIPS and writes pngs + an mp4 (`neural_render.py:323-510`,
  incl. `write2video` `:503-510`). Needs --mano_left/--mano_right.
- `--lpips_weights` points at a converted LPIPS-Alex .npz
  (utils/lpips.py); without it the LPIPS column is skipped, like the
  reference without the lpips package installed.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from os.path import join

from ._common import platform_arg, apply_platform


def write2video(frames, path: str, fps: int = 10) -> None:
    """frames: list of [H, W, 3] float RGB in [0,1] -> mp4.

    Parity: `/root/reference/neural_render.py:503-510`.
    """
    import cv2
    import numpy as np

    if not frames:
        return
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        vw.write((np.clip(f[..., ::-1], 0, 1) * 255).astype(np.uint8))
    vw.release()


def _load_ckpt(path: str):
    import numpy as np
    from ..optim.neural import NeuralRenderState

    with open(path, "rb") as f:
        d = pickle.load(f)
    return NeuralRenderState(
        net_params=d["net"], net_g_params=d.get("net_g"),
        vertex_feat=np.asarray(d["vertex_feature"]),
        vertices=np.asarray(d["vertices"]),
        albedo=np.asarray(d["albedo"]),
    )


def _save_ckpt(path: str, state) -> None:
    import jax
    import numpy as np

    with open(path, "wb") as f:
        pickle.dump({
            "net": jax.device_get(state.net_params),
            "net_g": jax.device_get(state.net_g_params),
            "vertex_feature": np.asarray(state.vertex_feat),
            "vertices": np.asarray(state.vertices),
            "albedo": np.asarray(state.albedo),
        }, f)


def _eval_views(render_one, views, imgs, num, out_dir, tag, scan_id,
                lpips_fn=None):
    """Shared eval loop: metrics + pngs.

    Returns (metrics dict, frames, per_view dict of metric lists); the
    per-view lists let the interhand branch report held-out-camera
    subsets separately.
    """
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..utils.metrics import psnr, psnr_reference, ssim

    rng = jax.random.PRNGKey(0)
    psnrs, ssims, ref_psnrs, lpipss, frames = [], [], [], [], []
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
        if lpips_fn is not None:
            lpipss.append(float(lpips_fn(gt[None], pr[None])[0]))
        frames.append(pr)
        cv2.imwrite(join(out_dir, f"{tag}_{scan_id}_{k:02d}.png"),
                    (pr[..., ::-1] * 255).clip(0, 255).astype(np.uint8))
    metrics = dict(
        psnr=float(np.mean(psnrs)), ref_psnr=float(np.mean(ref_psnrs)),
        ssim=float(np.mean(ssims)), fps=num / max(infer_time, 1e-9),
    )
    per_view = dict(psnr=psnrs, ref_psnr=ref_psnrs, ssim=ssims)
    if lpipss:
        metrics["lpips"] = float(np.mean(lpipss))
        per_view["lpips"] = lpipss
    return metrics, frames, per_view


def train_and_eval(conf_path: str, scan_id: int, data_path: str,
                   net_type: str = "mlp", num_epochs: int | None = None,
                   res_override=None, continue_train: bool = False,
                   lpips_weights: str | None = None,
                   repose_id: int | None = None,
                   mano_left: str | None = None,
                   mano_right: str | None = None,
                   holdout_cams: tuple = ()):
    import types

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..utils.config import load_config
    from ..utils.obj_io import load_obj, save_obj
    from ..utils.artifacts import load_ham_out
    from ..data import load_demo_views
    from ..optim.neural import train_neural_renderer, neural_forward

    conf = load_config(conf_path)
    data_type = conf.get_string("data_type", "demo")
    w = conf.get_int("w"); h = conf.get_int("h")
    if res_override:
        w, h = res_override
    num = conf.get_int("num")

    # eval_views: the view set scored AFTER training. For `demo` it is the
    # training set (the reference has no val split there); for `interhand`
    # it comes from the get_valinterhand_data equivalent and — with
    # --holdout_cams — contains cameras the trainer never saw, giving the
    # reference's held-out novel-view PSNR/SSIM/LPIPS
    # (`/root/reference/neural_render.py:255-321,515-586`).
    if data_type == "interhand":
        # `neural_render.py:84-89`: batch 8, 100 epochs, conf-driven paths
        from ..body.mano import ManoModel
        from ..data.interhand import (load_interhand_scan,
                                      load_interhand_eval_views)

        data_path = data_path or conf.get_string("data_path")
        data_name = conf.get_string("data_name").strip()
        capture_name = conf.get_string("capture_name")
        split = conf.get_string("split", "train")
        drop_cam = tuple(
            c for c in conf.get_string("drop_cam", "").split(",") if c)
        train_drop = drop_cam + tuple(holdout_cams)
        in_dir = join("interhand_out", f"{capture_name}_{data_name}")
        out_path = "interhand_out"

        mano_models = {}
        if mano_left:
            mano_models["left"] = ManoModel.load_npz(mano_left)
        if mano_right:
            mano_models["right"] = ManoModel.load_npz(mano_right)
        gcn_out_dir = join(in_dir, conf.get_string("input_mesh_dire",
                                                   "gcn_out"))
        if not os.path.isdir(gcn_out_dir):
            gcn_out_dir = None

        scan = load_interhand_scan(
            data_path, scan_id, mano_models, res=(w, h),
            data_name=data_name, capture_name=capture_name,
            drop_cam=train_drop, split=split, return_ray=True,
            gcn_out_dir=gcn_out_dir)
        views = scan
        num = scan.imgs.shape[0]
        batch = min(8, num)  # `neural_render.py:84`; clamped to the view count

        ev_imgs, ev_w2cs, ev_projs, ev_rays, ev_names, _ = (
            load_interhand_eval_views(
                data_path, scan_id, res=(w, h), data_name=data_name,
                capture_name=capture_name, drop_cam=drop_cam, split=split,
                return_ray=True))
        eval_views = types.SimpleNamespace(
            rays=ev_rays, w2cs=ev_w2cs, projs=ev_projs)
        eval_imgs = ev_imgs[..., ::-1]
        eval_num = ev_imgs.shape[0]
        eval_names = ev_names
        default_epochs = 100
    else:
        out_path = data_path.rstrip("/").split("/")[-1].replace(
            "data", "out")
        in_dir = join(out_path,
                      conf.get_string("out_mesh_dire", "demo_sfs"),
                      str(scan_id))
        views = load_demo_views(data_path, scan_id, num=num, res=(w, h),
                                with_mask=False, return_ray=True)
        batch = 2
        eval_views, eval_num = views, num
        eval_imgs = views.imgs[..., ::-1]
        eval_names = [f"{k:02d}" for k in range(num)]
        default_epochs = 200

    imgs = views.imgs[..., ::-1]  # BGR -> RGB (`neural_render.py:87` flip(3))

    verts, faces = load_obj(join(in_dir, f"{scan_id}.obj"))
    ham_path = join(in_dir, f"{scan_id}.npz")
    if not os.path.exists(ham_path):
        ham_path = join(in_dir, f"{scan_id}.pt")
    ham = load_ham_out(ham_path)
    albedo = np.asarray(ham["albedo"]).reshape(-1, 3)[: verts.shape[0]]

    epochs = num_epochs if num_epochs is not None else default_epochs
    ckpt_dir = join(in_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt_path = join(ckpt_dir, f"{net_type}_{scan_id}_{epochs}.pkl")

    init_state = None
    if continue_train and os.path.exists(ckpt_path):
        init_state = _load_ckpt(ckpt_path)
        print(f"continue_train: resuming from {ckpt_path}")

    orbax_dir = join(ckpt_dir, f"orbax_{net_type}_{scan_id}")
    if not continue_train and os.path.isdir(orbax_dir):
        # fresh run requested: drop stale mid-phase snapshots so the
        # orbax resume below doesn't skip training
        import shutil

        shutil.rmtree(orbax_dir)

    state, l1, l2, (net, net_g, pe) = train_neural_renderer(
        imgs, views.masks, views.rays, views.w2cs, views.projs,
        verts, faces, albedo, num_epochs=epochs, batch=batch,
        net_type=net_type, init_state=init_state,
        # crash-safe mid-phase snapshots (orbax); a crashed run under the
        # same dir resumes mid-phase rather than restarting
        checkpoint_dir=orbax_dir,
    )

    _save_ckpt(ckpt_path, state)
    save_obj(join(in_dir, f"final_{scan_id}.obj"),
             np.asarray(state.vertices), faces)

    lpips_fn = None
    if lpips_weights and os.path.exists(lpips_weights):
        from ..utils.lpips import LPIPSAlex
        lpips_fn = jax.jit(LPIPSAlex(lpips_weights).__call__)

    # ---------------- eval (`neural_render.py:223-321`) -------------------
    os.makedirs(join(in_dir, "rerender"), exist_ok=True)
    faces_j = jnp.asarray(faces)

    # audit-sized pass-A pair budget (same reason as in the trainer)
    from ..optim.ham import project_verts
    from ..raster.deferred import audit_deferred_rows
    _, _rb = audit_deferred_rows(
        project_verts(state.vertices, eval_views.w2cs, eval_views.projs),
        faces, (h, w))
    raster_kw = {"rows_budget": _rb}

    @jax.jit
    def render_one(ray, w2c, proj, rng):
        return neural_forward(
            lambda p, x: net.apply(p, x), state.net_params, pe,
            ray, w2c, proj, state.vertices, faces_j, state.albedo,
            state.vertex_feat, (h, w), rng, raster_kw=raster_kw,
        )

    metrics, frames, per_view = _eval_views(
        render_one, eval_views, eval_imgs, eval_num,
        join(in_dir, "rerender"), "nr", scan_id, lpips_fn)
    lp = f" | LPIPS {metrics['lpips']:.4f}" if "lpips" in metrics else ""
    print(f"render ave: PSNR {metrics['psnr']:.3f} dB | "
          f"refPSNR {metrics['ref_psnr']:.3f} | SSIM {metrics['ssim']:.4f}"
          f"{lp}")
    print(f"render fps: {metrics['fps']:.2f}")
    if holdout_cams:
        # novel-view subset: cameras excluded from training above
        idx = [k for k, n in enumerate(eval_names) if n in set(holdout_cams)]
        if idx:
            metrics["holdout"] = {
                k: float(np.mean([v[i] for i in idx]))
                for k, v in per_view.items()
            }
            hl = metrics["holdout"]
            lp = (f" | LPIPS {hl['lpips']:.4f}" if "lpips" in hl else "")
            print(f"held-out novel views ({len(idx)} cams): "
                  f"PSNR {hl['psnr']:.3f} dB | refPSNR {hl['ref_psnr']:.3f}"
                  f" | SSIM {hl['ssim']:.4f}{lp}")
    write2video(frames, join(in_dir, f"render_{scan_id}.mp4"))

    # ---------------- eval_repose (`neural_render.py:323-501`) ------------
    if repose_id is not None:
        rm = eval_repose(
            conf, state, net, pe, scan_id, repose_id, data_path,
            out_path, faces, (h, w), lpips_fn,
            mano_left=mano_left, mano_right=mano_right,
            data_type=data_type)
        metrics["repose"] = rm
    return state, metrics


def eval_repose(conf, state, net, pe, scan_id: int, repose_id: int,
                data_path: str, out_path: str, faces, resolution,
                lpips_fn=None, mano_left: str | None = None,
                mano_right: str | None = None, data_type: str = "demo"):
    """Re-animate the trained scan avatar to `repose_id`'s MANO pose,
    render all views, score, write pngs + video.

    Parity: `/root/reference/neural_render.py:323-501`; the interhand
    branch mirrors `:369-397` (MANO params per frame + val-style views).
    """
    import types

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..body.mano import ManoModel
    from ..core.subdivision import subdivide_weights_loop
    from ..data import load_demo_views
    from ..optim.neural import neural_forward
    from ..optim.repose_eval import repose_vertices
    from ..utils.artifacts import load_mano_out

    h, w = resolution
    if data_type == "interhand":
        data_name = conf.get_string("data_name").strip()
        capture_name = conf.get_string("capture_name")
        in_dir = join("interhand_out", f"{capture_name}_{data_name}")
        # mesh_sfs's interhand driver writes the per-frame MANO params
        # next to the HAM outputs as <frame>_mano.npz
        mano_dir = in_dir
        mano_suffix = "_mano"
    else:
        in_dir = join(out_path, conf.get_string("out_mesh_dire", "demo_sfs"),
                      str(scan_id))
        mano_dir = join(out_path,
                        conf.get_string("input_mesh_dire", "mano_out"))
        mano_suffix = ""

    def _mano_out(sid):
        p = join(mano_dir, f"{sid}{mano_suffix}.npz")
        if not os.path.exists(p):
            p = join(mano_dir, f"{sid}{mano_suffix}.pt")
        return load_mano_out(p)

    mano_a = _mano_out(scan_id)
    mano_b = _mano_out(repose_id)

    # The reference uses the x3-subdivided weights (`mano_weight_sub3.pkl`,
    # `repose.py:26-41`); here the level is inferred from the trained mesh
    # so non-default `subdiv_iters` HAM runs repose correctly too.
    vlen = np.asarray(state.vertices).shape[0] // max(len(mano_a), 1)
    models, sub_weights = {}, {}
    for hand, path in (("left", mano_left), ("right", mano_right)):
        if path:
            m = ManoModel.load_npz(path)
            models[hand] = m
            v, fc, sw = m.v_template, m.faces.astype(np.int64), m.lbs_weights
            for _ in range(6):
                if sw.shape[0] >= vlen:
                    break
                v, fc, sw = subdivide_weights_loop(sw, v, fc, 1)
            if sw.shape[0] != vlen:
                raise ValueError(
                    f"cannot match {hand} weights ({sw.shape[0]}) to the "
                    f"trained mesh per-hand vertex count ({vlen})")
            sub_weights[hand] = {"weights": sw}

    new_verts = repose_vertices(
        np.asarray(state.vertices), mano_a, mano_b, models, sub_weights)

    if data_type == "interhand":
        from ..data.interhand import load_interhand_eval_views

        drop_cam = tuple(
            c for c in conf.get_string("drop_cam", "").split(",") if c)
        bi, bw, bp, br, _, _ = load_interhand_eval_views(
            data_path, repose_id, res=(w, h), data_name=data_name,
            capture_name=capture_name, drop_cam=drop_cam,
            split=conf.get_string("split", "train"), return_ray=True)
        views_b = types.SimpleNamespace(rays=br, w2cs=bw, projs=bp)
        imgs_b = bi[..., ::-1]
        num = bi.shape[0]
    else:
        num = conf.get_int("num")
        views_b = load_demo_views(data_path, repose_id, num=num, res=(w, h),
                                  with_mask=False, return_ray=True)
        imgs_b = views_b.imgs[..., ::-1]

    faces_j = jnp.asarray(np.asarray(faces))
    nv = jnp.asarray(new_verts)

    from ..optim.ham import project_verts
    from ..raster.deferred import audit_deferred_rows
    _, _rb = audit_deferred_rows(
        project_verts(nv, views_b.w2cs, views_b.projs),
        np.asarray(faces), (h, w))
    raster_kw = {"rows_budget": _rb}

    @jax.jit
    def render_one(ray, w2c, proj, rng):
        return neural_forward(
            lambda p, x: net.apply(p, x), state.net_params, pe,
            ray, w2c, proj, nv, faces_j, state.albedo,
            state.vertex_feat, (h, w), rng, raster_kw=raster_kw,
        )

    repose_dir = join(in_dir, "repose")
    os.makedirs(repose_dir, exist_ok=True)
    metrics, frames, _ = _eval_views(
        render_one, views_b, imgs_b, num, repose_dir, "repose",
        repose_id, lpips_fn)
    lp = f" | LPIPS {metrics['lpips']:.4f}" if "lpips" in metrics else ""
    print(f"repose {scan_id}->{repose_id}: PSNR {metrics['psnr']:.3f} dB | "
          f"refPSNR {metrics['ref_psnr']:.3f} | SSIM {metrics['ssim']:.4f}"
          f"{lp} | fps {metrics['fps']:.2f}")
    write2video(frames, join(repose_dir, f"repose_{scan_id}_{repose_id}.mp4"))
    return metrics


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", type=str, default="conf/demo_sfs.conf")
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--data_path", type=str, default=None,
                    help="required for data_type=demo; defaults to the "
                         "conf's data_path for interhand")
    ap.add_argument("--net_type", type=str, default="mlp",
                    choices=["mlp", "unet"])
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--continue_train", action="store_true")
    ap.add_argument("--lpips_weights", type=str, default=None)
    ap.add_argument("--repose_id", type=int, default=None,
                    help="re-animate the avatar to this scan's MANO pose")
    ap.add_argument("--mano_left", type=str, default=None)
    ap.add_argument("--mano_right", type=str, default=None)
    ap.add_argument("--holdout_cams", type=str, default="",
                    help="comma-separated cameras excluded from training "
                         "but scored at eval (interhand novel-view eval)")
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    train_and_eval(args.conf, args.scan_id, args.data_path, args.net_type,
                   args.num_epoch, continue_train=args.continue_train,
                   lpips_weights=args.lpips_weights,
                   repose_id=args.repose_id, mano_left=args.mano_left,
                   mano_right=args.mano_right,
                   holdout_cams=tuple(
                       c for c in args.holdout_cams.split(",") if c))
