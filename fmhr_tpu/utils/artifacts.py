"""Stage artifacts: the on-disk handoffs between pipeline stages.

The reference stages communicate through the filesystem (SURVEY.md §1 L5):
keypoints `.xyz` text, MANO params `.pt` (torch pickles of
`[params_left, params_right]` dicts, `mano_optim.py:349`), HAM
`{sh_coeff, albedo}` `.pt`, meshes `.obj`. This module reads BOTH the
reference's torch formats (torch-cpu is available for unpickling) and our
native `.npz` equivalents, and writes `.npz` — so a user can point this
framework at artifacts produced by the reference and vice versa.
"""

from __future__ import annotations

import os

import numpy as np


def _to_numpy(x):
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def load_keypoints3d(path: str) -> np.ndarray:
    """`keypoints_3d_%d.xyz` text file, [42, 3] (`pose_optim.py:134`)."""
    return np.loadtxt(path).astype(np.float32)


def save_keypoints3d(path: str, k3d) -> None:
    np.savetxt(path, np.asarray(k3d))


def load_mano_out(path: str) -> list[dict]:
    """List of per-hand dicts {type, pose, shape, trans|Rt, scale?}.

    Reads reference `.pt` (torch pickle) or our `.npz`.
    """
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        out = []
        for d in data:
            e = {"type": d["type"]}
            for k in ("pose", "shape", "trans", "Rt", "scale"):
                if k in d:
                    v = d[k]
                    e[k] = _to_numpy(v) if hasattr(v, "detach") else v
            out.append(e)
        return out
    data = np.load(path, allow_pickle=True)
    n = int(data["num_hands"])
    out = []
    for i in range(n):
        e = {"type": str(data[f"type_{i}"])}
        for k in ("pose", "shape", "trans", "Rt", "scale"):
            key = f"{k}_{i}"
            if key in data:
                e[k] = data[key]
        out.append(e)
    return out


def save_mano_out(path: str, hands: list[dict]) -> None:
    blob = {"num_hands": np.asarray(len(hands))}
    for i, d in enumerate(hands):
        blob[f"type_{i}"] = np.asarray(d["type"])
        for k in ("pose", "shape", "trans", "Rt", "scale"):
            if k in d:
                blob[f"{k}_{i}"] = np.asarray(d[k])
    np.savez(path, **blob)


def load_ham_out(path: str) -> dict:
    """HAM `{sh_coeff, albedo}` (`mesh_sfs_optim.py:321`)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        d = torch.load(path, map_location="cpu", weights_only=False)
        return {k: _to_numpy(v) for k, v in d.items()}
    d = np.load(path)
    return {k: d[k] for k in d.files}


def save_ham_out(path: str, sh_coeff, albedo) -> None:
    np.savez(path, sh_coeff=np.asarray(sh_coeff), albedo=np.asarray(albedo))
