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


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
