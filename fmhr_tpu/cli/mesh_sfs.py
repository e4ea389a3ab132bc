"""CLI: HAM mesh+albedo shape-from-shading optimization.

Parity: `python mesh_sfs_optim.py --conf conf/demo_sfs.conf --scan_id N
--data_path ./demo_data` (`/root/reference/mesh_sfs_optim.py:30-396`,
`README.md:54,73`). Dispatches on the conf's `data_type`:

- `demo`: loads the fused two-hand mesh from `mano_out`, Loop-subdivides
  x3 per hand, runs the two-stage HAM optimizer.
- `interhand` (`mesh_sfs_optim.py:92-118`): loads an InterHand2.6M frame
  (cameras + MANO annotations or cached `gcn_out` meshes), rasterizes
  masks with our own rasterizer, then the same pipeline. Requires
  --mano_left/--mano_right converted .npz models.
- sequence mode (`conf/ih_sfsseq.conf`, 10+5 epochs/frame): pass
  --frames N to process scan_id..scan_id+N-1 with albedo/SH/delta
  warm-started from the previous frame.

Outputs per scan:
  <out>/demo_sfs/<scan>/ori_<scan>.obj      initial subdivided mesh
  <out>/demo_sfs/<scan>/<scan>.obj          optimized mesh
  <out>/demo_sfs/<scan>/<scan>_c.obj        albedo-colored mesh
  <out>/demo_sfs/<scan>/<scan>.npz          {sh_coeff, albedo}
  <out>/demo_sfs/<scan>/rerender/*.png      final renders
  <out>/demo_sfs/<scan>/<scan>_<hand>_tpose.obj   (with --mano_left/right)
"""

from __future__ import annotations

import argparse
import os
from os.path import join

from ._common import platform_arg, apply_platform


def _subdivide_per_hand(mesh_v, mesh_f, n_hands: int, iters: int = 3):
    """x`iters` Loop subdivision per hand (`mesh_sfs_optim.py:75-88`)."""
    import numpy as np
    from ..core.subdivision import loop_subdivide_iter

    len_v = mesh_v.shape[0] // n_hands
    len_f = mesh_f.shape[0] // n_hands
    verts_list, faces_list, off = [], [], 0
    for i in range(n_hands):
        v = mesh_v[i * len_v:(i + 1) * len_v]
        f = mesh_f[i * len_f:(i + 1) * len_f] - i * len_v
        v, f = loop_subdivide_iter(v, f, iters)
        faces_list.append(f + off)
        verts_list.append(v)
        off += v.shape[0]
    return (np.concatenate(verts_list).astype(np.float32),
            np.concatenate(faces_list).astype(np.int32))


def main(conf_path: str, scan_id: int, data_path: str | None = None,
         mano_left: str | None = None, mano_right: str | None = None,
         frames: int = 1) -> dict:
    from ..utils.config import load_config

    conf = load_config(conf_path)
    if conf.get_string("data_type", "demo") == "interhand":
        return main_interhand(conf, scan_id, data_path, mano_left,
                              mano_right, frames)
    return main_demo(conf, scan_id, data_path, mano_left, mano_right)


def main_demo(conf, scan_id: int, data_path: str,
              mano_left: str | None = None,
              mano_right: str | None = None) -> dict:
    import numpy as np
    import jax.numpy as jnp
    import cv2

    from ..utils.obj_io import load_obj, save_obj, save_obj_with_colors
    from ..utils.artifacts import load_mano_out, save_ham_out
    from ..core.subdivision import subdivide_weights_loop
    from ..core.mesh import vertex_normals
    from ..core.sh import sh_radiance
    from ..data import load_demo_views
    from ..optim import HamConfig, run_ham
    from ..optim.ham import project_verts
    from ..raster import rasterize, interpolate, antialias, AATopology

    cfg = HamConfig.from_config(conf)
    num = conf.get_int("num")

    out_path = data_path.rstrip("/").split("/")[-1].replace("data", "out")
    out_dir = join(out_path, conf.get_string("out_mesh_dire", "demo_sfs"),
                   str(scan_id))
    in_dir = join(out_path, conf.get_string("input_mesh_dire", "mano_out"))
    os.makedirs(out_dir, exist_ok=True)

    views = load_demo_views(data_path, scan_id, num=num,
                            res=(cfg.width, cfg.height))

    mesh_v, mesh_f = load_obj(join(in_dir, f"{scan_id}.obj"))
    mano_path = join(in_dir, f"{scan_id}.npz")
    if not os.path.exists(mano_path):
        mano_path = join(in_dir, f"{scan_id}.pt")
    mano_out = load_mano_out(mano_path)

    n_hands = len(mano_out)
    vertices, faces = _subdivide_per_hand(mesh_v, mesh_f, n_hands)

    save_obj(join(out_dir, f"ori_{scan_id}.obj"), vertices, faces)

    out = run_ham(views.imgs, views.grayimgs, views.masks, views.w2cs,
                  views.projs, vertices, faces, cfg)

    final_v = np.asarray(out["vertices"])
    albedo = np.asarray(out["albedo"])
    sh_coeffs = np.asarray(out["sh_coeffs"])

    save_obj(join(out_dir, f"{scan_id}.obj"), final_v, faces)
    save_ham_out(join(out_dir, f"{scan_id}.npz"), sh_coeffs, albedo)
    color = np.clip(0.5 * albedo, 0, 1)
    save_obj_with_colors(join(out_dir, f"{scan_id}_c.obj"), final_v, faces,
                         color[:, 2::-1])

    # final rerenders (`mesh_sfs_optim.py:337-343`)
    os.makedirs(join(out_dir, "rerender"), exist_ok=True)
    topo_aa = AATopology.build(faces, final_v.shape[0])
    fv = jnp.asarray(final_v)
    normals = vertex_normals(fv, faces)
    for k in range(num):
        clip = project_verts(fv, jnp.asarray(views.w2cs[k:k+1]),
                             jnp.asarray(views.projs[k:k+1]))
        rast = rasterize(clip, faces, (cfg.height, cfg.width))
        feat = interpolate(
            jnp.concatenate([normals, jnp.asarray(albedo)], -1), rast, faces
        )
        from ..core.mesh import safe_normalize
        nrm = safe_normalize(feat[..., :3])
        rad = sh_radiance(jnp.asarray(sh_coeffs[k]), nrm, cfg.degree)
        img = rad[..., None] * feat[..., 3:6]
        valid = (views.masks[k] > 0) & (np.asarray(rast[0, ..., 3]) > 0)
        img = np.where(valid[..., None], np.asarray(img[0]), 0.0)
        img = np.asarray(antialias(jnp.asarray(img)[None], rast, clip, faces,
                                   topo_aa)[0])
        cv2.imwrite(join(out_dir, "rerender", f"mesh_{k:02d}.png"),
                    (img * 255).astype(np.int32))

    # T-pose export via inverse LBS (`mesh_sfs_optim.py:345-388`)
    mano_paths = {"left": mano_left, "right": mano_right}
    if all(mano_paths.get(h["type"]) for h in mano_out):
        from ..body.mano import ManoModel, lbs_tpose

        vertices_length = final_v.shape[0] // n_hands
        for i, para in enumerate(mano_out):
            hand = para["type"]
            model = ManoModel.load_npz(mano_paths[hand])
            _, sub_faces, sub_w = subdivide_weights_loop(
                model.lbs_weights, model.v_template,
                model.faces.astype(np.int64), 3,
            )
            v_hand = final_v[vertices_length * i: vertices_length * (i + 1)]
            pose = np.asarray(para["pose"]).reshape(1, -1)
            shape = np.asarray(para["shape"]).reshape(1, -1)
            v_in = jnp.asarray(v_hand)[None]
            if "Rt" in para:
                Rt = np.asarray(para["Rt"]).reshape(4, 4)
                ones = jnp.ones((1, v_in.shape[1], 1))
                v_in = (jnp.concatenate([v_in, ones], 2)
                        @ jnp.asarray(np.linalg.inv(Rt)))[..., :3]
            else:
                trans = np.asarray(para["trans"]).reshape(1, 1, 3)
                scale = float(para.get("scale", 1.0))
                v_in = (v_in - trans) / scale
            verts_t = lbs_tpose(model, jnp.asarray(pose), jnp.asarray(shape),
                                jnp.asarray(sub_w), v_in)
            if "Rt" in para:
                ones = jnp.ones((1, verts_t.shape[1], 1))
                verts_t = (jnp.concatenate([verts_t, ones], 2)
                           @ jnp.asarray(Rt))[..., :3]
            else:
                verts_t = verts_t * scale + trans
            save_obj(join(out_dir, f"{scan_id}_{hand}_tpose.obj"),
                     np.asarray(verts_t[0]), sub_faces)

    print(f"HAM done: stage A {float(out['losses_albedo'][0]):.4f} -> "
          f"{float(out['losses_albedo'][-1]):.4f}; stage B "
          f"{float(out['losses_sfs'][0]):.4f} -> "
          f"{float(out['losses_sfs'][-1]):.4f}; wrote {out_dir}")
    return out


def main_interhand(conf, scan_id: int, data_path: str | None,
                   mano_left: str | None, mano_right: str | None,
                   frames: int = 1) -> dict:
    """InterHand2.6M HAM driver (`mesh_sfs_optim.py:92-118`), plus the
    warm-started per-frame sequence mode (`conf/ih_sfsseq.conf`)."""
    import numpy as np

    from ..body.mano import ManoModel
    from ..data.interhand import load_interhand_scan
    from ..optim import HamConfig, run_ham
    from ..utils.obj_io import save_obj, save_obj_with_colors
    from ..utils.artifacts import save_ham_out, save_mano_out

    cfg = HamConfig.from_config(conf)
    data_path = data_path or conf.get_string("data_path")
    data_name = conf.get_string("data_name").strip()
    capture_name = conf.get_string("capture_name")
    split = conf.get_string("split", "train")
    drop_cam = tuple(
        c for c in conf.get_string("drop_cam", "").split(",") if c)

    # ./interhand_out/<capture>_<data>/ mirrors `mesh_sfs_optim.py:43-47`
    out_root = "interhand_out"
    out_dir = join(out_root, f"{capture_name}_{data_name}")
    in_dire = conf.get_string("input_mesh_dire", "gcn_out")
    gcn_out_dir = join(out_dir, in_dire)
    if not os.path.isdir(gcn_out_dir):
        gcn_out_dir = None
    os.makedirs(out_dir, exist_ok=True)

    mano_models = {}
    if mano_left:
        mano_models["left"] = ManoModel.load_npz(mano_left)
    if mano_right:
        mano_models["right"] = ManoModel.load_npz(mano_right)

    warm = None
    out = None
    for frame in range(scan_id, scan_id + max(1, frames)):
        scan = load_interhand_scan(
            data_path, frame, mano_models,
            res=(cfg.width, cfg.height), data_name=data_name,
            capture_name=capture_name, drop_cam=drop_cam, split=split,
            gcn_out_dir=gcn_out_dir,
        )
        vertices, faces = _subdivide_per_hand(
            scan.vertices, scan.faces, len(scan.mano_out),
            iters=conf.get_int("subdiv_iters", 3))
        save_obj(join(out_dir, f"ori_{frame}.obj"), vertices, faces)

        out = run_ham(scan.imgs, scan.grayimgs, scan.masks, scan.w2cs,
                      scan.projs, vertices, faces, cfg, warm_start=warm)
        warm = {"albedo": out["albedo"], "sh_coeffs": out["sh_coeffs"],
                "delta": out["delta"]}

        final_v = np.asarray(out["vertices"])
        albedo = np.asarray(out["albedo"])
        save_obj(join(out_dir, f"{frame}.obj"), final_v, faces)
        save_ham_out(join(out_dir, f"{frame}.npz"),
                     np.asarray(out["sh_coeffs"]), albedo)
        color = np.clip(0.5 * albedo, 0, 1)
        save_obj_with_colors(join(out_dir, f"{frame}_c.obj"), final_v,
                             faces, color[:, 2::-1])
        save_mano_out(join(out_dir, f"{frame}_mano.npz"), scan.mano_out)
        print(f"HAM[interhand] frame {frame}: stage A "
              f"{float(out['losses_albedo'][0]):.4f} -> "
              f"{float(out['losses_albedo'][-1]):.4f}; stage B "
              f"{float(out['losses_sfs'][0]):.4f} -> "
              f"{float(out['losses_sfs'][-1]):.4f}; wrote {out_dir}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", type=str, default="conf/demo_sfs.conf")
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--data_path", type=str, default=None)
    ap.add_argument("--mano_left", type=str, default=None)
    ap.add_argument("--mano_right", type=str, default=None)
    ap.add_argument("--frames", type=int, default=1,
                    help=">1 = warm-started sequence mode (ih_sfsseq.conf)")
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    main(args.conf, args.scan_id, args.data_path, args.mano_left,
         args.mano_right, args.frames)
