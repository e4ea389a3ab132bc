"""Demo-capture loader (the `demo_data` layout).

Host-side equivalent of `get_demo_data` (`/root/reference/get_data.py:49-118`)
and the pose-JSON loader (`pose_optim.py:33-83`):

    <root>/<scan_id>/camera/param.npz   world_mat_i, scale_mat_i (+ int_i)
    <root>/<scan_id>/img/%02d.png
    <root>/<scan_id>/mask/%02d.png
    <root>/<scan_id>/pose/%02d.json     {"Left": [63 floats], "Right": [...]}

Returns numpy arrays; callers device-put / shard as needed.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from ..core.cameras import camera_matrices_from_P, get_ray_directions, get_rays


@dataclasses.dataclass
class DemoViews:
    imgs: np.ndarray       # [N, H, W, 3] float32 in [0, 1] (BGR, like cv2)
    grayimgs: np.ndarray   # [N, H, W]
    masks: np.ndarray      # [N, H, W] float32 {0, 1}
    w2cs: np.ndarray       # [N, 4, 4] transposed (row-vector convention)
    projs: np.ndarray      # [N, 4, 4] transposed
    rays: np.ndarray | None = None  # [N, H, W, 3] world ray dirs

    @property
    def num_views(self) -> int:
        return self.w2cs.shape[0]


def load_demo_views(
    data_path: str,
    scan_id: int,
    num: int = 16,
    res: tuple[int, int] = (1280, 1024),
    with_mask: bool = True,
    return_ray: bool = False,
) -> DemoViews:
    """res = (W, H) like the reference's `(w, h)` argument.

    Images are masked then resized exactly as the reference does
    (`get_data.py:77-94`): mask binarized at >127.5, image zeroed outside,
    gray from BGR, area-resize for images, nearest for masks.
    """
    import cv2

    W, H = res
    cam = np.load(os.path.join(data_path, f"{scan_id}/camera/param.npz"))

    imgs, grays, masks, w2cs, projs, rays = [], [], [], [], [], []
    calib = None  # calibration resolution = native image size
    for i in range(num):
        img = cv2.imread(os.path.join(data_path, f"{scan_id}/img/{i:02d}.png"))
        if calib is None:
            # The NDC fixup must use the resolution K was calibrated at
            # (the native image size); the working resolution `res` only
            # sets the raster/image grid. NDC itself is res-independent.
            calib = (img.shape[1], img.shape[0])
        P = (cam[f"world_mat_{i}"].astype(np.float32)
             @ cam[f"scale_mat_{i}"].astype(np.float32))[:3]
        w2c_T, proj_T = camera_matrices_from_P(P, calib[0], calib[1])
        w2cs.append(w2c_T)
        projs.append(proj_T)

        mask = cv2.imread(os.path.join(data_path, f"{scan_id}/mask/{i:02d}.png"))[:, :, 0]
        mask = (mask > 127.5).astype(np.float32)
        if with_mask:
            img = img.copy()
            img[mask == 0] = 0
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)

        img = cv2.resize(img, (W, H))
        gray = cv2.resize(gray, (W, H))
        mask = cv2.resize(mask, (W, H), interpolation=cv2.INTER_NEAREST)

        imgs.append((img / 255.0).astype(np.float32))
        grays.append((gray / 255.0).astype(np.float32))
        masks.append(mask)

        if return_ray:
            K = cam[f"int_{i}"]
            # intrinsics scale with the working resolution
            sx, sy = W / calib[0], H / calib[1]
            dirs = get_ray_directions(
                H, W, K[0, 0] * sx, K[1, 1] * sy, K[0, 2] * sx, K[1, 2] * sy
            )
            c2w = np.linalg.inv(w2c_T.T)
            rd, _ = get_rays(dirs, c2w)
            rays.append(rd.reshape(H, W, 3).astype(np.float32))

    return DemoViews(
        imgs=np.stack(imgs),
        grayimgs=np.stack(grays),
        masks=np.stack(masks),
        w2cs=np.stack(w2cs),
        projs=np.stack(projs),
        rays=np.stack(rays) if return_ray else None,
    )


def load_demo_keypoints2d(
    data_path: str, scan_id: int, num: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """MediaPipe 2D keypoints + per-view/per-point weights.

    Parity: `pose_optim.py:63-82`: missing hands get weight 0 and dummy
    coords -1; layout = 21 left then 21 right, xy in [-1, 1] NDC.
    Returns (poses [N, 42, 3], weights [N, 42]).
    """
    poses, weights = [], np.ones((num, 42), np.float32)
    for i in range(num):
        with open(os.path.join(data_path, f"{scan_id}/pose/{i:02d}.json")) as f:
            pf = json.load(f)
        if len(pf["Left"]) == 0:
            pf["Left"] = [-1.0] * 63
            weights[i, :21] = 0
        if len(pf["Right"]) == 0:
            pf["Right"] = [-1.0] * 63
            weights[i, 21:] = 0
        poses.append(np.asarray(pf["Left"] + pf["Right"], np.float32).reshape(42, 3))
    return np.stack(poses), weights
