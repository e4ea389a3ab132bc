"""MANO .pkl -> .npz converter (chumpy-free).

The official MANO pickles store chumpy arrays; the reference loads them
through `smplx`/`models/smplx.py:203-234` with `encoding='latin1'`. Here we
unpickle without chumpy installed by intercepting chumpy classes and
scipy-sparse wrappers and extracting the raw ndarray.

Usage:
    python -m fmhr_tpu.body.convert MANO_LEFT.pkl mano_left.npz
"""

from __future__ import annotations

import pickle
import sys

import numpy as np


class _NDArrayStandIn:
    """Reconstructs as a plain holder; chumpy `Ch` objects pickle their
    data in state dicts with key 'x'."""

    def __init__(self, *args, **kwargs):
        self.__dict__["_state"] = {}

    def __setstate__(self, state):
        self.__dict__["_state"] = state

    def __array__(self):
        s = self.__dict__["_state"]
        for k in ("x", "a", "data"):
            if isinstance(s, dict) and k in s:
                return np.asarray(s[k])
        raise ValueError("cannot extract array from chumpy stand-in")


class _ChumpyUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _NDArrayStandIn
        return super().find_class(module, name)


def _to_array(x):
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_mano_pkl(path: str) -> dict:
    with open(path, "rb") as f:
        data = _ChumpyUnpickler(f, encoding="latin1").load()
    return data


def convert(pkl_path: str, npz_path: str) -> None:
    d = load_mano_pkl(pkl_path)
    posedirs = _to_array(d["posedirs"])
    num_pose = posedirs.shape[-1]
    out = dict(
        v_template=_to_array(d["v_template"]).astype(np.float32),
        shapedirs=_to_array(d["shapedirs"]).astype(np.float32),
        posedirs=np.reshape(posedirs, (-1, num_pose)).T.astype(np.float32),
        J_regressor=_to_array(d["J_regressor"]).astype(np.float32),
        lbs_weights=_to_array(d["weights"]).astype(np.float32),
        parents=np.asarray(d["kintree_table"])[0].astype(np.int32),
        faces=_to_array(d["f"]).astype(np.int32),
        hand_mean=_to_array(d["hands_mean"]).reshape(-1).astype(np.float32),
        hand_components=_to_array(d["hands_components"]).astype(np.float32),
        is_rhand=np.array("RIGHT" in pkl_path.upper() or "rhand" in pkl_path),
    )
    # MANO kintree root parent is stored as 4294967295 (= -1 cast); fix to 0.
    parents = out["parents"]
    parents[0] = 0
    np.savez(npz_path, **out)
    print(f"wrote {npz_path}: V={out['v_template'].shape[0]} "
          f"F={out['faces'].shape[0]} J={out['J_regressor'].shape[0]}")


def convert_smplx(pkl_path: str, npz_path: str,
                  num_pca_comps: int = 45) -> None:
    """SMPL-X body .pkl -> .npz for :class:`fmhr_tpu.body.smplx.SmplxModel`.

    Field mapping per `/root/reference/models/smplx.py:200-290`. The
    kintree root parent arrives as 4294967295 (uint32 -1) and is kept as
    -1 (the chain-walk convention of `find_joint_kin_chain`).
    """
    d = load_mano_pkl(pkl_path)
    posedirs = _to_array(d["posedirs"])
    num_pose = posedirs.shape[-1]
    parents = np.asarray(d["kintree_table"])[0].astype(np.int64)
    parents = np.where(parents > 1 << 31, -1, parents).astype(np.int32)

    from .smplx import SMPLX_VERTEX_IDS, _EXTRA_ID_ORDER

    extra = np.asarray([SMPLX_VERTEX_IDS[k] for k in _EXTRA_ID_ORDER],
                       np.int32)
    dyn_f = d.get("dynamic_lmk_faces_idx")
    dyn_b = d.get("dynamic_lmk_bary_coords")
    out = dict(
        v_template=_to_array(d["v_template"]).astype(np.float32),
        shapedirs=_to_array(d["shapedirs"]).astype(np.float32),
        posedirs=np.reshape(posedirs, (-1, num_pose)).T.astype(np.float32),
        J_regressor=_to_array(d["J_regressor"]).astype(np.float32),
        lbs_weights=_to_array(d["weights"]).astype(np.float32),
        parents=parents,
        faces=_to_array(d["f"]).astype(np.int32),
        left_hand_components=_to_array(
            d["hands_componentsl"])[:num_pca_comps].astype(np.float32),
        right_hand_components=_to_array(
            d["hands_componentsr"])[:num_pca_comps].astype(np.float32),
        left_hand_mean=_to_array(d["hands_meanl"]).reshape(-1).astype(
            np.float32),
        right_hand_mean=_to_array(d["hands_meanr"]).reshape(-1).astype(
            np.float32),
        extra_joints_idxs=extra,
        lmk_faces_idx=_to_array(d["lmk_faces_idx"]).astype(np.int32),
        lmk_bary_coords=_to_array(d["lmk_bary_coords"]).astype(np.float32),
        dynamic_lmk_faces_idx=(
            _to_array(dyn_f).astype(np.int32) if dyn_f is not None
            else np.zeros((0, 0), np.int32)),
        dynamic_lmk_bary_coords=(
            _to_array(dyn_b).astype(np.float32) if dyn_b is not None
            else np.zeros((0, 0, 3), np.float32)),
    )
    np.savez(npz_path, **out)
    print(f"wrote {npz_path}: V={out['v_template'].shape[0]} "
          f"F={out['faces'].shape[0]} J={out['J_regressor'].shape[0]}")


if __name__ == "__main__":
    if "--smplx" in sys.argv:
        sys.argv.remove("--smplx")
        convert_smplx(sys.argv[1], sys.argv[2])
    else:
        convert(sys.argv[1], sys.argv[2])
