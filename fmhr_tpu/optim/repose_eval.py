"""Re-animation (repose) of a trained avatar + evaluation.

TPU-native rebuild of `neural_render.py:323-501` (eval_repose): take the
HAM-refined mesh + trained renderer of frame A, inverse-LBS the mesh to
the T-pose using frame A's MANO parameters and the x3-subdivided skinning
weights, forward-LBS with frame B's parameters, render with the frozen
renderer, and score against frame B's captured images.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..body.mano import ManoModel, lbs, lbs_tpose


def _unpose_hand(para, verts):
    """Undo the world alignment of one hand (`neural_render.py:441-445`)."""
    if "Rt" in para and para["Rt"] is not None:
        Rt = np.asarray(para["Rt"]).reshape(4, 4)
        ones = jnp.ones((1, verts.shape[1], 1))
        return (jnp.concatenate([verts, ones], 2)
                @ jnp.asarray(np.linalg.inv(Rt)))[..., :3]
    trans = np.asarray(para["trans"]).reshape(1, 1, 3)
    scale = float(para.get("scale", 1.0))
    return (verts - trans) / scale


def _pose_hand(para, verts):
    """Apply the world alignment of one hand (`neural_render.py:454-463`)."""
    if "Rt" in para and para["Rt"] is not None:
        Rt = np.asarray(para["Rt"]).reshape(4, 4)
        ones = jnp.ones((1, verts.shape[1], 1))
        return (jnp.concatenate([verts, ones], 2) @ jnp.asarray(Rt))[..., :3]
    trans = np.asarray(para["trans"]).reshape(1, 1, 3)
    scale = float(para.get("scale", 1.0))
    return verts * scale + trans


def repose_vertices(
    vertices: np.ndarray,          # [V, 3] HAM-refined fused mesh (frame A)
    mano_out_last: list,           # frame A per-hand params
    mano_out_new: list,            # frame B per-hand params
    models: dict,                  # {"left"/"right": ManoModel}
    sub_weights: dict,             # {"left"/"right": {"weights": [Vs, 16]}}
) -> np.ndarray:
    """Map frame-A vertices to frame-B pose via inverse+forward LBS.

    Parity: the per-hand loop of `neural_render.py:421-463`.
    """
    n = len(mano_out_last)
    vlen = vertices.shape[0] // n
    out = []
    for i, (pa, pb) in enumerate(zip(mano_out_last, mano_out_new)):
        hand = pa["type"]
        model = models[hand]
        w = jnp.asarray(sub_weights[hand]["weights"])
        v = jnp.asarray(vertices[vlen * i: vlen * (i + 1)])[None]
        v = _unpose_hand(pa, v)
        pose_a = jnp.asarray(np.asarray(pa["pose"]).reshape(1, -1))
        shape_a = jnp.asarray(np.asarray(pa["shape"]).reshape(1, -1))
        verts_t = lbs_tpose(model, pose_a, shape_a, w, v)
        pose_b = jnp.asarray(np.asarray(pb["pose"]).reshape(1, -1))
        verts_new = lbs(model, pose_b, shape_a, w, verts_t)
        verts_new = _pose_hand(pb, verts_new)
        out.append(np.asarray(verts_new[0]))
    return np.concatenate(out, 0)
