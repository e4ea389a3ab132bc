"""CLI: fit MANO pose/shape/trans/scale to triangulated 3D keypoints.

Parity: `python mano_optim.py --data_path ... --out_path ...`
(`/root/reference/mano_optim.py:295-363`, `README.md:68`). Requires the
converted MANO model files (see `fmhr_tpu.body.convert`); writes
`<out>/mano_out/<scan>.obj` (fused two-hand mesh) and
`<out>/mano_out/<scan>.npz` (params readable by downstream stages;
the reference writes a torch `.pt` — `utils.artifacts` reads both).
"""

from __future__ import annotations

import argparse
import os

from ._common import platform_arg, apply_platform


def main(scan_id: int, out_path: str, mano_left: str, mano_right: str,
         epochs: int = 250) -> None:
    import numpy as np
    import jax.numpy as jnp
    from ..body.mano import ManoModel
    from ..optim import fit_mano_two_hands
    from ..utils.artifacts import load_keypoints3d, save_mano_out
    from ..utils.obj_io import save_obj

    ml = ManoModel.load_npz(mano_left)
    mr = ManoModel.load_npz(mano_right)
    k3d = load_keypoints3d(
        os.path.join(out_path, "keypoints3d", f"keypoints_3d_{scan_id}.xyz")
    )[None]

    fit_l, fit_r, vl, vr, losses = fit_mano_two_hands(ml, mr, jnp.asarray(k3d),
                                                      epochs=epochs)
    os.makedirs(os.path.join(out_path, "mano_out"), exist_ok=True)

    verts = np.concatenate([vl[0], vr[0]], 0)
    faces = np.concatenate([ml.faces, mr.faces + vl.shape[1]], 0)
    save_obj(os.path.join(out_path, "mano_out", f"{scan_id}.obj"), verts, faces)
    save_mano_out(
        os.path.join(out_path, "mano_out", f"{scan_id}.npz"),
        [fit_l.as_mano_out(), fit_r.as_mano_out()],
    )
    print(f"loss {float(losses[0]):.5f} -> {float(losses[-1]):.5f}; "
          f"wrote mano_out/{scan_id}.obj/.npz")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--range", type=int, default=None)
    ap.add_argument("--out_path", type=str, required=True)
    ap.add_argument("--mano_left", type=str, default="mano/mano_left.npz")
    ap.add_argument("--mano_right", type=str, default="mano/mano_right.npz")
    ap.add_argument("--epochs", type=int, default=250)
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    if args.range is not None:
        for i in range(1, args.range + 1):
            main(i, args.out_path, args.mano_left, args.mano_right, args.epochs)
    else:
        main(args.scan_id, args.out_path, args.mano_left, args.mano_right,
             args.epochs)
