"""InterHand2.6M loader.

Host-side equivalent of `get_interhand_data`
(`/root/reference/get_data.py:120-288`) and the renderer dataset
(`train_mlp.py:44-163`):

  <root>/annotations/<split>/InterHand2.6M_<split>_camera.json
  <root>/annotations/<split>/InterHand2.6M_<split>_MANO_NeuralAnnot.json
  <root>/images/<split>/<capture>/<seq>/cam<id>/image<frame>.jpg

Differences from the reference, by design:
- masks are produced by rasterizing the MANO mesh with OUR rasterizer
  (the reference uses nvdiffrast for the same job, `get_data.py:246-254`);
  the optional SAM refinement hook (`get_data.py:28-47`) is exposed as a
  callable the caller may supply (SAM itself is an external model).
- MANO meshes come from the pure-JAX MANO layer given converted .npz
  models; cached `gcn_out` meshes are honored the same way.
"""

from __future__ import annotations

import dataclasses
import json
import os
from os.path import join

import numpy as np

from ..core.cameras import load_K_Rt_from_P, ndc_projection, get_ray_directions, get_rays


def interhand_camera(cam_param: dict, cam_idx: str, res: tuple[int, int]):
    """Build (w2c_T, proj_T) from InterHand camera annotations.

    Parity: `get_data.py:200-227`: campos (mm -> m), camrot as
    world->camera, intrinsics from focal/princpt. NOTE `res` must equal
    the resolution the annotations were calibrated at (334x512 for the
    '400' cameras) — same coupling as the reference; the NDC fixup uses
    it directly.
    """
    W, H = res
    t = np.array(cam_param["campos"][cam_idx], np.float32).reshape(3)
    R = np.array(cam_param["camrot"][cam_idx], np.float32).reshape(3, 3)
    ext = np.eye(4)
    ext[:3, :3] = R
    ext[:3, 3] = -(R @ t.reshape(3, 1)).reshape(3) / 1000.0

    focal = np.array(cam_param["focal"][cam_idx], np.float32).reshape(2)
    princpt = np.array(cam_param["princpt"][cam_idx], np.float32).reshape(2)
    K = np.array(
        [[focal[0], 0, princpt[0]], [0, focal[1], princpt[1]], [0, 0, 1]]
    )
    P = K @ ext[:3]
    intr, w2c = load_K_Rt_from_P(P[:3])
    proj = ndc_projection(intr, W, H)
    return w2c.T.astype(np.float32), proj.T.astype(np.float32)


@dataclasses.dataclass
class InterhandScan:
    imgs: np.ndarray
    grayimgs: np.ndarray
    masks: np.ndarray | None
    w2cs: np.ndarray
    projs: np.ndarray
    vertices: np.ndarray      # [V, 3] fused MANO mesh
    faces: np.ndarray         # [F, 3]
    mano_out: list
    rays: np.ndarray | None
    camera_names: list
    img_name: str


def load_interhand_scan(
    data_path: str,
    scan_id: int,
    mano_models: dict,          # {"left": ManoModel, "right": ManoModel}
    res=(334, 512),
    data_name: str = "0002_good_luck",
    capture_name: str = "Capture0",
    drop_cam=(),
    split: str = "train",
    return_ray: bool = False,
    make_masks: bool = True,
    mask_refiner=None,          # optional callable(imgs, masks) -> masks
    gcn_out_dir: str | None = None,
) -> InterhandScan:
    import cv2
    import jax.numpy as jnp

    capture_idx = capture_name.replace("Capture", "")
    with open(join(data_path, f"annotations/{split}",
                   f"InterHand2.6M_{split}_camera.json")) as f:
        cam_params = json.load(f)
    with open(join(data_path, f"annotations/{split}",
                   f"InterHand2.6M_{split}_MANO_NeuralAnnot.json")) as f:
        mano_params = json.load(f)
    cam_param = cam_params[capture_idx]

    seq_dir = join(data_path, f"images/{split}", capture_name, data_name)
    camera_names = [c for c in sorted(os.listdir(seq_dir))
                    if c not in drop_cam and "400" in c]
    img_name = sorted(os.listdir(join(seq_dir, camera_names[0])))[scan_id]

    # ---- initial mesh: cached gcn_out or MANO from annotations ----------
    from ..body.mano import mano_forward
    from ..utils.obj_io import load_obj
    from ..utils.artifacts import load_mano_out

    mano_out, vertices, faces = [], [], []
    cached = gcn_out_dir and os.path.exists(join(gcn_out_dir, f"ori_{scan_id}.obj"))
    if cached:
        vertices, faces = load_obj(join(gcn_out_dir, f"ori_{scan_id}.obj"))
        for ext in (".npz", ".pt"):
            p = join(gcn_out_dir, f"{scan_id}{ext}")
            if os.path.exists(p):
                mano_out = load_mano_out(p)
                break
    else:
        frame_key = str(int(img_name[5:-4]))
        mp = mano_params[capture_idx][frame_key]
        offset = 0
        verts_all, faces_all = [], []
        for hand_type in ("left", "right"):
            if mp[hand_type] is None:
                continue
            pose = np.array(mp[hand_type]["pose"], np.float32).reshape(-1, 3)
            shape = np.array(mp[hand_type]["shape"], np.float32).reshape(1, -1)
            trans = np.array(mp[hand_type]["trans"], np.float32).reshape(1, 3)
            model = mano_models[hand_type]
            v, _ = mano_forward(
                model,
                jnp.asarray(pose[0].reshape(1, 3)),
                jnp.asarray(pose[1:].reshape(1, -1)),
                jnp.asarray(shape),
                transl=jnp.asarray(trans),
                use_pca=False,
            )
            verts_all.append(np.asarray(v[0]))
            faces_all.append(model.faces + offset)
            offset += model.num_vertices
            mano_out.append({"type": hand_type, "pose": pose.reshape(-1),
                             "shape": shape, "trans": trans})
        vertices = np.concatenate(verts_all, 0)
        faces = np.concatenate(faces_all, 0)

    # ---- images ---------------------------------------------------------
    W, H = res
    imgs, grays, w2cs, projs, rays = [], [], [], [], []
    for cam_name in camera_names:
        cam_idx = cam_name.replace("cam", "")
        w2c_T, proj_T = interhand_camera(cam_param, cam_idx, res)
        w2cs.append(w2c_T)
        projs.append(proj_T)
        img = cv2.imread(join(seq_dir, cam_name, img_name))
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        imgs.append((cv2.resize(img, (W, H)) / 255.0).astype(np.float32))
        grays.append((cv2.resize(gray, (W, H)) / 255.0).astype(np.float32))
        if return_ray:
            dirs = get_ray_directions(
                H, W, cam_param["focal"][cam_idx][0],
                cam_param["focal"][cam_idx][1],
                cam_param["princpt"][cam_idx][0],
                cam_param["princpt"][cam_idx][1],
            )
            c2w = np.linalg.inv(w2c_T.T)
            rd, _ = get_rays(dirs, c2w)
            rays.append(rd.reshape(H, W, 3).astype(np.float32))

    imgs = np.stack(imgs)
    grays = np.stack(grays)
    w2cs = np.stack(w2cs)
    projs = np.stack(projs)

    masks = None
    if make_masks:
        from ..optim.ham import project_verts
        from ..raster import rasterize, interpolate

        fv = jnp.asarray(vertices)
        fj = jnp.asarray(faces.astype(np.int32))
        masks_l = []
        for k in range(0, len(camera_names), 8):
            clip = project_verts(fv, jnp.asarray(w2cs[k:k+8]),
                                 jnp.asarray(projs[k:k+8]))
            rast = rasterize(clip, fj, (H, W))
            m = interpolate(jnp.ones((vertices.shape[0], 1)), rast, fj)
            masks_l.append(np.asarray(m[..., 0]))
        masks = np.concatenate(masks_l)
        if mask_refiner is not None:
            masks = mask_refiner(imgs, masks)
        imgs = imgs * (masks[..., None] > 0)
        grays = grays * (masks > 0)

    return InterhandScan(
        imgs=imgs, grayimgs=grays, masks=masks, w2cs=w2cs, projs=projs,
        vertices=np.asarray(vertices, np.float32),
        faces=np.asarray(faces, np.int32),
        mano_out=mano_out,
        rays=np.stack(rays) if return_ray else None,
        camera_names=camera_names, img_name=img_name,
    )


def load_interhand_eval_views(
    data_path: str,
    scan_id: int,
    res=(334, 512),
    data_name: str = "0002_good_luck",
    capture_name: str = "Capture0",
    drop_cam=(),
    split: str = "train",
    return_ray: bool = True,
):
    """Evaluation-time views: images + cameras only (no masks/mesh).

    Parity: `neural_render.py:515-586` (get_valinterhand_data). Returns
    (imgs, w2cs, projs, rays, camera_names, img_name).
    """
    import cv2
    import json as _json

    capture_idx = capture_name.replace("Capture", "")
    with open(join(data_path, f"annotations/{split}",
                   f"InterHand2.6M_{split}_camera.json")) as f:
        cam_param = _json.load(f)[capture_idx]

    seq_dir = join(data_path, f"images/{split}", capture_name, data_name)
    camera_names = [c for c in sorted(os.listdir(seq_dir))
                    if c not in drop_cam and "400" in c]
    img_name = sorted(os.listdir(join(seq_dir, camera_names[0])))[scan_id]

    W, H = res
    imgs, w2cs, projs, rays = [], [], [], []
    for cam_name in camera_names:
        cam_idx = cam_name.replace("cam", "")
        w2c_T, proj_T = interhand_camera(cam_param, cam_idx, res)
        w2cs.append(w2c_T)
        projs.append(proj_T)
        img = cv2.imread(join(seq_dir, cam_name, img_name))
        imgs.append((cv2.resize(img, (W, H)) / 255.0).astype(np.float32))
        if return_ray:
            dirs = get_ray_directions(
                H, W, cam_param["focal"][cam_idx][0],
                cam_param["focal"][cam_idx][1],
                cam_param["princpt"][cam_idx][0],
                cam_param["princpt"][cam_idx][1],
            )
            c2w = np.linalg.inv(w2c_T.T)
            rd, _ = get_rays(dirs, c2w)
            rays.append(rd.reshape(H, W, 3).astype(np.float32))

    return (np.stack(imgs), np.stack(w2cs), np.stack(projs),
            np.stack(rays) if return_ray else None, camera_names, img_name)


def load_dhm_views(
    data_path: str,
    scan_id: int,
    cam_json: str,
    res=(334, 512),
    data_name: str = "0003_fake_gun",
    capture_name: str = "subject_4",
    cam_key: str = "0",
):
    """DeepHandMesh-layout views for the multihands orchestrator.

    Parity: `multihands_mano.py:142-205` (get_dhm_data): images under
    `<root>/images/<capture>/<data>/<cam>/`, cameras from an
    InterHand-format camera JSON. The reference hardcodes a private
    absolute path to that JSON (`multihands_mano.py:144`); here it is the
    explicit `cam_json` argument. Returns (imgs, grayimgs, w2cs, projs,
    camera_names, img_name).
    """
    import cv2

    with open(cam_json) as f:
        cam_param = json.load(f)[cam_key]

    seq_dir = join(data_path, "images", capture_name, data_name)
    camera_names = sorted(os.listdir(seq_dir))
    img_name = sorted(os.listdir(join(seq_dir, camera_names[0])))[scan_id]

    W, H = res
    imgs, grays, w2cs, projs = [], [], [], []
    for cam_name in camera_names:
        cam_idx = cam_name.replace("cam", "")
        w2c_T, proj_T = interhand_camera(cam_param, cam_idx, res)
        w2cs.append(w2c_T)
        projs.append(proj_T)
        img = cv2.imread(join(seq_dir, cam_name, img_name))
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        imgs.append((cv2.resize(img, (W, H)) / 255.0).astype(np.float32))
        grays.append((cv2.resize(gray, (W, H)) / 255.0).astype(np.float32))

    return (np.stack(imgs), np.stack(grays), np.stack(w2cs),
            np.stack(projs), camera_names, img_name)
