"""CLI: end-to-end MANO-from-multi-view-images orchestrator.

Parity: `python multihands_mano.py --conf ... --data_path ...`
(`/root/reference/multihands_mano.py:207-348`, `README.md:79`):
per-view 2D keypoints -> triangulation -> MANO via parametric
optimization (or GCN inference with --use_gcn). 2D keypoints come from
the `pose/%02d.json` files (the reference's MediaPipe stage is an
external C++ detector; its outputs are data — run any detector and drop
JSONs in place, see `mediapipe_hands.py` in the reference).

Hand dropout follows the reference (`multihands_mano.py:271-298`): a hand
missed in >=80% of views is dropped from the scene.
"""

from __future__ import annotations

import argparse
import os
from os.path import join

from ._common import platform_arg, apply_platform


def load_keypoints2d_named(pose_dir: str, names: list[str]):
    """Per-camera 2D keypoint JSONs ({"Left": [63], "Right": [63]},
    MediaPipe-normalized [-1, 1]) looked up by camera name, falling back
    to `%02d.json` by index. Missing hands get weight 0 / coords -1
    (`pose_optim.py:63-82`)."""
    import json

    import numpy as np

    poses, weights = [], np.ones((len(names), 42), np.float32)
    for i, name in enumerate(names):
        p = join(pose_dir, f"{name}.json")
        if not os.path.exists(p):
            p = join(pose_dir, f"{i:02d}.json")
        with open(p) as f:
            pf = json.load(f)
        if len(pf.get("Left", [])) == 0:
            pf["Left"] = [-1.0] * 63
            weights[i, :21] = 0
        if len(pf.get("Right", [])) == 0:
            pf["Right"] = [-1.0] * 63
            weights[i, 21:] = 0
        poses.append(np.asarray(pf["Left"] + pf["Right"],
                                np.float32).reshape(42, 3))
    return np.stack(poses), weights


def mano_from_mvimages(data_path: str, scan_id: int, num: int = 16,
                       mano_left: str = "mano/mano_left.npz",
                       mano_right: str = "mano/mano_right.npz",
                       use_gcn: bool = False,
                       gcn_ckpts: dict | None = None,
                       data_type: str = "demo",
                       data_name: str = "0002_good_luck",
                       capture_name: str = "Capture0",
                       drop_cam=(), split: str = "train",
                       res=(334, 512), pose_dir: str | None = None,
                       dhm_cam_json: str | None = None) -> None:
    """data_type selects the loader (`multihands_mano.py:218-243`):
    'demo' (param.npz rig + pose/%02d.json), 'interhand'
    (InterHand2.6M annotations), 'dhm' (DeepHandMesh layout with an
    explicit camera JSON). For interhand/dhm the 2D keypoints come from
    `pose_dir` (the reference runs MediaPipe inline,
    `multihands_mano.py:253` — an external detector whose outputs are
    data here; drop JSONs named by camera in place)."""
    import numpy as np
    import jax.numpy as jnp
    from ..data import load_demo_views, load_demo_keypoints2d
    from ..optim import triangulate_keypoints, fit_mano_two_hands
    from ..body.mano import ManoModel
    from ..utils.artifacts import save_keypoints3d, save_mano_out
    from ..utils.obj_io import save_obj

    out_path = data_path.rstrip("/").split("/")[-1].replace("data", "out")
    if data_type == "interhand":
        out_path = join("interhand_out", f"{capture_name}_{data_name}")
    elif data_type == "dhm":
        out_path = join("dhm_out", f"{capture_name}_{data_name}")
    os.makedirs(join(out_path, "keypoints3d"), exist_ok=True)
    os.makedirs(join(out_path, "mano_out"), exist_ok=True)

    if data_type == "demo":
        views = load_demo_views(data_path, scan_id, num=num, with_mask=False)
        poses2d, weights = load_demo_keypoints2d(data_path, scan_id, num=num)
        w2cs, projs = views.w2cs, views.projs
    elif data_type == "interhand":
        from ..data.interhand import load_interhand_eval_views

        _, w2cs, projs, _, camera_names, _ = load_interhand_eval_views(
            data_path, scan_id, res=res, data_name=data_name,
            capture_name=capture_name, drop_cam=drop_cam, split=split,
            return_ray=False)
        num = len(camera_names)
        poses2d, weights = load_keypoints2d_named(pose_dir, camera_names)
    elif data_type == "dhm":
        from ..data.interhand import load_dhm_views

        _, _, w2cs, projs, camera_names, _ = load_dhm_views(
            data_path, scan_id, dhm_cam_json, res=res,
            data_name=data_name, capture_name=capture_name)
        num = len(camera_names)
        poses2d, weights = load_keypoints2d_named(pose_dir, camera_names)
    else:
        raise ValueError(f"unknown data_type {data_type!r}")

    # hand dropout (`multihands_mano.py:286-298`)
    drop_left = weights[:, 0].sum() < 0.2 * num
    drop_right = weights[:, 21].sum() < 0.2 * num
    if drop_left:
        weights[:, :21] = 0
    if drop_right:
        weights[:, 21:] = 0

    k3d, losses = triangulate_keypoints(
        w2cs, projs, poses2d, weights, epochs=250
    )
    save_keypoints3d(join(out_path, "keypoints3d",
                          f"keypoints_3d_{scan_id}.xyz"), np.asarray(k3d))

    ml = ManoModel.load_npz(mano_left)
    mr = ManoModel.load_npz(mano_right)

    if use_gcn:
        import pickle
        from ..nn.gcn import build_gcn_decoder
        from ..optim.gcn_train import gcn_infer

        hands, verts_list, faces_list, off = [], [], [], 0
        for hand, model, sl in (("left", ml, slice(0, 21)),
                                ("right", mr, slice(21, 42))):
            if (hand == "left" and drop_left) or (hand == "right" and drop_right):
                continue
            gcn, H = build_gcn_decoder(model.v_template, model.faces)
            with open(gcn_ckpts[hand], "rb") as f:
                params = pickle.load(f)
            joints = jnp.asarray(np.asarray(k3d)[None, sl])
            verts, mano_aligned, mano, Rt, _ = gcn_infer(
                gcn.apply, params, model, joints
            )
            hands.append({
                "type": hand,
                "pose": np.concatenate(
                    [np.zeros((1, 3), np.float32), np.asarray(mano[:, :-10])], 1
                ),
                "shape": np.asarray(mano[:, -10:]),
                "Rt": np.asarray(Rt[0]),
            })
            verts_list.append(np.asarray(mano_aligned[0]))
            faces_list.append(model.faces + off)
            off += model.num_vertices
        save_obj(join(out_path, "gcn_out", f"{scan_id}.obj") if False else
                 join(out_path, "mano_out", f"{scan_id}.obj"),
                 np.concatenate(verts_list), np.concatenate(faces_list))
        save_mano_out(join(out_path, "mano_out", f"{scan_id}.npz"), hands)
    else:
        fit_l, fit_r, vl, vr, _ = fit_mano_two_hands(ml, mr, jnp.asarray(k3d)[None])
        hands, verts_list, faces_list = [], [], []
        off = 0
        if not drop_left:
            hands.append(fit_l.as_mano_out())
            verts_list.append(vl[0]); faces_list.append(ml.faces + off)
            off += vl.shape[1]
        if not drop_right:
            hands.append(fit_r.as_mano_out())
            verts_list.append(vr[0]); faces_list.append(mr.faces + off)
        save_obj(join(out_path, "mano_out", f"{scan_id}.obj"),
                 np.concatenate(verts_list), np.concatenate(faces_list))
        save_mano_out(join(out_path, "mano_out", f"{scan_id}.npz"), hands)

    print(f"wrote {out_path}/mano_out/{scan_id}.obj/.npz "
          f"(dropped: left={bool(drop_left)} right={bool(drop_right)})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", type=str, required=True)
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--mano_left", type=str, default="mano/mano_left.npz")
    ap.add_argument("--mano_right", type=str, default="mano/mano_right.npz")
    ap.add_argument("--use_gcn", action="store_true")
    ap.add_argument("--gcn_left", type=str, default="mano/gcn_left.pkl")
    ap.add_argument("--gcn_right", type=str, default="mano/gcn_right.pkl")
    ap.add_argument("--data_type", default="demo",
                    choices=["demo", "interhand", "dhm"])
    ap.add_argument("--data_name", default="0002_good_luck")
    ap.add_argument("--capture_name", default="Capture0")
    ap.add_argument("--split", default="train")
    ap.add_argument("--drop_cam", default="")
    ap.add_argument("--res", type=int, nargs=2, default=(334, 512))
    ap.add_argument("--pose_dir", default=None,
                    help="dir of per-camera 2D keypoint JSONs "
                         "(interhand/dhm data types)")
    ap.add_argument("--dhm_cam_json", default=None)
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    mano_from_mvimages(
        args.data_path, args.scan_id, args.num, args.mano_left,
        args.mano_right, args.use_gcn,
        {"left": args.gcn_left, "right": args.gcn_right},
        data_type=args.data_type, data_name=args.data_name,
        capture_name=args.capture_name,
        drop_cam=tuple(c for c in args.drop_cam.split(",") if c),
        split=args.split, res=tuple(args.res), pose_dir=args.pose_dir,
        dhm_cam_json=args.dhm_cam_json,
    )
