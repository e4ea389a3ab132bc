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


def mano_from_mvimages(data_path: str, scan_id: int, num: int = 16,
                       mano_left: str = "mano/mano_left.npz",
                       mano_right: str = "mano/mano_right.npz",
                       use_gcn: bool = False,
                       gcn_ckpts: dict | None = None) -> None:
    import numpy as np
    import jax.numpy as jnp
    from ..data import load_demo_views, load_demo_keypoints2d
    from ..optim import triangulate_keypoints, fit_mano_two_hands
    from ..body.mano import ManoModel
    from ..utils.artifacts import save_keypoints3d, save_mano_out
    from ..utils.obj_io import save_obj

    out_path = data_path.rstrip("/").split("/")[-1].replace("data", "out")
    os.makedirs(join(out_path, "keypoints3d"), exist_ok=True)
    os.makedirs(join(out_path, "mano_out"), exist_ok=True)

    views = load_demo_views(data_path, scan_id, num=num, with_mask=False)
    poses2d, weights = load_demo_keypoints2d(data_path, scan_id, num=num)

    # hand dropout (`multihands_mano.py:286-298`)
    drop_left = weights[:, 0].sum() < 0.2 * num
    drop_right = weights[:, 21].sum() < 0.2 * num
    if drop_left:
        weights[:, :21] = 0
    if drop_right:
        weights[:, 21:] = 0

    k3d, losses = triangulate_keypoints(
        views.w2cs, views.projs, poses2d, weights, epochs=250
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
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    mano_from_mvimages(
        args.data_path, args.scan_id, args.num, args.mano_left,
        args.mano_right, args.use_gcn,
        {"left": args.gcn_left, "right": args.gcn_right},
    )
