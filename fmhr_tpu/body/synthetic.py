"""Deterministic synthetic hand-like model for tests and benchmarks.

Real MANO pickles are user-supplied assets (reference `README.md:46-48`),
so tests exercise the full LBS/rasterization stack on a procedurally built
articulated model with MANO's exact tensor layout: 16 joints in the MANO
kinematic tree, a closed tube mesh per finger chain, smooth skinning
weights, small random shape/pose blend shapes.
"""

from __future__ import annotations

import numpy as np

from .mano import ManoModel

# MANO kinematic tree (16 joints): wrist + 5 fingers x 3 segments.
MANO_PARENTS = (0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)


def _tube(p0, p1, radius, segments=6, rings=3):
    """Open tube from p0 to p1. Returns (verts [N,3], faces [M,3])."""
    p0, p1 = np.asarray(p0, np.float64), np.asarray(p1, np.float64)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    axis = axis / max(length, 1e-9)
    # orthonormal frame
    a = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(axis, a)
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    verts = []
    for r in range(rings + 1):
        c = p0 + axis * (length * r / rings)
        for s in range(segments):
            ang = 2 * np.pi * s / segments
            verts.append(c + radius * (np.cos(ang) * u + np.sin(ang) * v))
    faces = []
    for r in range(rings):
        for s in range(segments):
            s2 = (s + 1) % segments
            i0 = r * segments + s
            i1 = r * segments + s2
            i2 = (r + 1) * segments + s
            i3 = (r + 1) * segments + s2
            faces.append([i0, i2, i1])
            faces.append([i1, i2, i3])
    return np.asarray(verts), np.asarray(faces, np.int64)


def synthetic_hand_model(seed: int = 0, is_rhand: bool = True) -> ManoModel:
    """Build a deterministic articulated tube-hand with MANO's layout."""
    rng = np.random.default_rng(seed)
    side = 1.0 if is_rhand else -1.0

    # Joint rest positions: palm at origin, fingers fanning in +x.
    joints = np.zeros((16, 3))
    finger_dirs = []
    for f in range(5):
        ang = (f - 2) * 0.3
        d = np.array([np.cos(ang), np.sin(ang), 0.0])
        d[0] *= side
        finger_dirs.append(d)
        base = d * 0.35
        for s in range(3):
            joints[1 + f * 3 + s] = base + d * 0.22 * (s + 1)

    verts_list, faces_list = [], []
    seg_ends = []  # (joint_a, joint_b) per tube
    # palm tube
    verts_list.append(_tube([0, 0, 0], [side * 0.3, 0, 0], 0.16, 8, 2)[0])
    faces_list.append(_tube([0, 0, 0], [side * 0.3, 0, 0], 0.16, 8, 2)[1])
    seg_ends.append((0, 0))
    for f in range(5):
        for s in range(3):
            j = 1 + f * 3 + s
            p0 = joints[j - 1] if s > 0 else finger_dirs[f] * 0.35
            p1 = joints[j]
            v, fc = _tube(p0, p1, 0.05, 6, 2)
            seg_ends.append((j if s > 0 else 0, j))
            faces_list.append(fc + sum(len(x) for x in verts_list))
            verts_list.append(v)

    v_template = np.concatenate(verts_list).astype(np.float32)
    faces = np.concatenate(faces_list).astype(np.int32)
    V = v_template.shape[0]

    # Skinning weights: softmax over inverse distances to the 16 joints.
    d = np.linalg.norm(v_template[:, None] - joints[None], axis=2)
    w = np.exp(-(d / 0.12) ** 2) + 1e-6
    lbs_weights = (w / w.sum(1, keepdims=True)).astype(np.float32)

    # J_regressor: soft assignment so J_regressor @ v_template ~= joints.
    jr = np.exp(-(d.T / 0.06) ** 2) + 1e-9
    J_regressor = (jr / jr.sum(1, keepdims=True)).astype(np.float32)

    shapedirs = (rng.normal(size=(V, 3, 10)) * 0.01).astype(np.float32)
    posedirs = (rng.normal(size=(15 * 9, V * 3)) * 0.001).astype(np.float32)
    hand_mean = (rng.normal(size=45) * 0.05).astype(np.float32)
    q = rng.normal(size=(45, 45))
    hand_components = np.linalg.qr(q)[0].astype(np.float32)

    return ManoModel(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=J_regressor,
        lbs_weights=lbs_weights,
        parents=MANO_PARENTS,
        faces=faces,
        hand_mean=hand_mean,
        hand_components=hand_components,
        is_rhand=is_rhand,
    )
