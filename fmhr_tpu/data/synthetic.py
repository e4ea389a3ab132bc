"""Synthetic calibrated camera rigs and scenes for tests/benchmarks."""

from __future__ import annotations

import numpy as np


def ring_cameras(n: int, radius: float = 3.0, res=64, focal_scale: float = 1.0):
    """n cameras on a ring looking at the origin.

    res: int (square) or (H, W). Returns (w2cs [n,4,4], projs [n,4,4])
    TRANSPOSED, in the reference clip convention (w = view depth,
    z = -0.1). focal_scale multiplies the default focal length (zoom).
    """
    h, w = (res, res) if isinstance(res, int) else res
    w2cs, projs = [], []
    f = min(h, w) * 1.2 * focal_scale  # focal length in pixels
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = np.array([radius * np.cos(ang), 0.4, radius * np.sin(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        dn = np.cross(fwd, right)  # y down in camera frame
        R = np.stack([right, dn, fwd])  # world->cam rows
        t = -R @ eye
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R; w2c[:3, 3] = t
        proj = np.zeros((4, 4), np.float32)
        proj[0, 0] = f / (w / 2.0)
        proj[1, 1] = f / (h / 2.0)
        proj[2, 3] = -0.1
        proj[3, 2] = 1.0
        w2cs.append(w2c.T); projs.append(proj.T)
    return np.stack(w2cs), np.stack(projs)


def hand_scene(res=64, n_views: int = 8, subdiv: int = 0,
               two_hands: bool = False, base_refine: int = 0,
               fill: float | None = None):
    """Synthetic hand mesh + ring cameras; returns (verts, faces, w2cs, projs).

    res: int (square) or (H, W). two_hands mirrors the mesh into a fused
    left+right pair, matching the reference's two-hand workloads
    (`/root/reference/mano_optim.py:320-322` face fusion). base_refine
    pre-subdivides the template: one refinement takes the synthetic base
    from 392 to 1568 faces ~= MANO's 1538
    (`/root/reference/mesh_sfs_optim.py:82` subdivides MANO x3 to the
    production ~98.4k faces; base_refine=1, subdiv=3 reproduces that
    density here).

    fill: target silhouette coverage as a FRACTION OF FRAME AREA — the
    cameras zoom so the rendered mask covers ~fill of the image. The
    real demo capture frames its two hands at 5.6-7.5% mask coverage
    (`/root/reference/demo_data/1/mask/*.png` at 1280x1024); the default
    (None) keeps the legacy wide framing (~0.2-0.4% coverage) that
    rounds <=3 benchmarked — a mostly-background frame that understates
    covered-tile work (BASELINE.md round-4 note).
    """
    from ..body import synthetic_hand_model
    from ..core.subdivision import loop_subdivide_iter

    m = synthetic_hand_model()
    # Rest pose with zero shape and no pose blend is exactly v_template
    # (identity joint transforms) — computing it on host avoids paying a
    # device compile just to build a benchmark scene (60s+ first-op on
    # tunneled TPU backends). tests/test_core.py pins this equivalence.
    verts = np.asarray(m.v_template, np.float32) * 0.45
    faces = np.asarray(m.faces)
    if base_refine:
        verts, faces = loop_subdivide_iter(verts, faces, base_refine)
    if subdiv:
        verts, faces = loop_subdivide_iter(verts, faces, subdiv)
    if two_hands:
        V = verts.shape[0]
        left = verts * np.asarray([-1.0, 1.0, 1.0], np.float32)
        verts = np.concatenate(
            [left - np.asarray([0.28, 0, 0], np.float32),
             verts + np.asarray([0.28, 0, 0], np.float32)])
        faces = np.concatenate([faces, faces + V])
    focal_scale = 1.0
    if fill is not None:
        # Empirical zoom: measure the MEAN projected silhouette coverage
        # at focal_scale=1 by rasterizing the (dense) vertex cloud onto
        # the pixel grid (unique covered pixels ~= silhouette area at
        # subdiv-3 vertex density), then scale the focal in closed form
        # — coverage scales with focal^2 until the frame clips.
        h, w = (res, res) if isinstance(res, int) else res
        w2cs0, projs0 = ring_cameras(n_views, res=res)
        ph = np.concatenate([verts, np.ones_like(verts[:, :1])], -1)
        covs = []
        for b in range(n_views):
            clip = ph @ w2cs0[b] @ projs0[b]
            zpos = clip[:, 3] > 1e-6
            x = np.clip((clip[zpos, 0] / clip[zpos, 3] + 1) * (w / 2),
                        0, w - 1).astype(np.int64)
            y = np.clip((clip[zpos, 1] / clip[zpos, 3] + 1) * (h / 2),
                        0, h - 1).astype(np.int64)
            covs.append(len(np.unique(y * w + x)) / (h * w))
        cov0 = max(float(np.mean(covs)), 1e-9)
        focal_scale = float(np.sqrt(fill / cov0))
    w2cs, projs = ring_cameras(n_views, res=res, focal_scale=focal_scale)
    return verts.astype(np.float32), faces.astype(np.int32), w2cs, projs
