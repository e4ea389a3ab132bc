"""CLI: triangulate 3D hand keypoints from per-view 2D detections.

Parity: `python pose_optim.py --data_path ./demo_data --scan_id 1 ...`
(`/root/reference/pose_optim.py:123-148`, `README.md:66`). Writes
`<out>/keypoints3d/keypoints_3d_<scan>.xyz`.
"""

from __future__ import annotations

import argparse
import os

from ._common import platform_arg, apply_platform, out_dirs


def main(scan_id: int, data_path: str, out_path: str | None,
         num: int = 16, epochs: int = 500) -> str:
    import numpy as np
    from ..data import load_demo_views, load_demo_keypoints2d
    from ..optim import triangulate_keypoints
    from ..utils.artifacts import save_keypoints3d

    views = load_demo_views(data_path, scan_id, num=num, with_mask=False)
    poses2d, weights = load_demo_keypoints2d(data_path, scan_id, num=num)
    pred, losses = triangulate_keypoints(
        views.w2cs, views.projs, poses2d, weights, epochs=epochs
    )
    if out_path is None:
        out_path = data_path.rstrip("/").split("/")[-1].replace("data", "out")
    out_dir = os.path.join(out_path, "keypoints3d")
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, f"keypoints_3d_{scan_id}.xyz")
    save_keypoints3d(dst, np.asarray(pred))
    print(f"loss {float(losses[0]):.5f} -> {float(losses[-1]):.5f}; wrote {dst}")
    return dst


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--range", type=int, default=None)
    ap.add_argument("--data_path", type=str, required=True)
    ap.add_argument("--out_path", type=str, default=None)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=500)
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    if args.range is not None:
        for i in range(args.range):
            main(i + 1, args.data_path, args.out_path, args.num, args.epochs)
    else:
        main(args.scan_id, args.data_path, args.out_path, args.num, args.epochs)
