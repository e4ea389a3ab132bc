"""Category-level neural-renderer training over a feature dataset.

TPU-native rebuild of the reference's large-scale training loop
(`/root/reference/train_mlp.py:207-283` / `train_unet.py:200-257`):
training the renderer across MANY scans of InterHand2.6M, streaming
(image, rays, cameras, per-scan mesh+albedo+features) samples from disk.

Host-side input pipeline: `FeatureDataset` reads the reference's
`features/<split>/<capture>/<seq>/<frame>.npy` blobs
(`train_mlp.py:141-154`: dict with albedo/feature/vertices/faces,
truncated to the fixed 49281/98432 sizes) plus the camera annotations;
`prefetch_batches` runs loading in a background thread so the device
never waits on IO (the reference uses torch DataLoader workers,
`train_mlp.py:220`).

The jitted step trains net + the SHARED vertex-feature table (one table
for the whole category, as in the reference: `vertex_feat` of fixed size
49281x20, `train_mlp.py:231`).
"""

from __future__ import annotations

import os
import queue
import threading
from os.path import join

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..nn.pe import IcosahedronEncoding
from ..nn.mlp import RenderMLP
from .neural import neural_forward

# Fixed category-level sizes (`train_mlp.py:151-154`).
NUM_VERTS = 49281
NUM_FACES = 98432


class FeatureDataset:
    """Index of (capture, seq, frame, camera) samples with features."""

    def __init__(self, data_path, split="train", drop_cam=(), res=(334, 512)):
        import json

        self.data_path = data_path
        self.split = split
        self.res = res
        with open(join(data_path, f"annotations/{split}",
                       f"InterHand2.6M_{split}_camera.json")) as f:
            self.cam_params = json.load(f)
        self.samples = []
        img_root = join(data_path, "images", split)
        for capture in sorted(os.listdir(img_root)):
            for seq in sorted(os.listdir(join(img_root, capture))):
                if "dh" in seq:
                    continue
                cams = [c for c in sorted(os.listdir(join(img_root, capture, seq)))
                        if c not in drop_cam and "400" in c]
                if not cams:
                    continue
                for img_name in sorted(os.listdir(join(img_root, capture, seq, cams[0]))):
                    frame = img_name[5:-4]
                    feat = join(data_path, "features", split, capture, seq,
                                f"{frame}.npy")
                    if os.path.exists(feat):
                        for cam in cams:
                            self.samples.append((capture, seq, frame, cam))

    def __len__(self):
        return len(self.samples)

    def load(self, idx):
        import cv2
        from .ham import project_verts  # noqa: F401  (doc reference)
        from ..data.interhand import interhand_camera
        from ..core.cameras import get_ray_directions, get_rays

        capture, seq, frame, cam = self.samples[idx]
        W, H = self.res
        cam_param = self.cam_params[capture.replace("Capture", "")]
        cam_idx = cam.replace("cam", "")
        w2c_T, proj_T = interhand_camera(cam_param, cam_idx, self.res)

        img = cv2.imread(join(self.data_path, "images", self.split, capture,
                              seq, cam, f"image{frame}.jpg"))
        img = (cv2.resize(img, (W, H)) / 255.0).astype(np.float32)[..., ::-1]

        blob = np.load(join(self.data_path, "features", self.split, capture,
                            seq, f"{frame}.npy"), allow_pickle=True).item()
        albedo = np.asarray(blob["albedo"]).reshape(-1, 3)[:NUM_VERTS]
        feature = np.asarray(blob["feature"]).reshape(-1, 20)[:NUM_VERTS]
        vertices = np.asarray(blob["vertices"])[:NUM_VERTS]
        faces = np.asarray(blob["faces"])[:NUM_FACES]

        dirs = get_ray_directions(
            H, W, cam_param["focal"][cam_idx][0], cam_param["focal"][cam_idx][1],
            cam_param["princpt"][cam_idx][0], cam_param["princpt"][cam_idx][1],
        )
        c2w = np.linalg.inv(w2c_T.T)
        rd, _ = get_rays(dirs, c2w)
        ray = rd.reshape(H, W, 3).astype(np.float32)
        return dict(img=img, ray=ray, w2c=w2c_T, proj=proj_T,
                    vertices=vertices.astype(np.float32),
                    faces=faces.astype(np.int32),
                    albedo=albedo.astype(np.float32),
                    feature=feature.astype(np.float32))


def prefetch_batches(dataset, batch_size, epochs, seed=0, depth=2):
    """Background-thread batch producer (host-side DataLoader analog)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    rng = np.random.default_rng(seed)

    def worker():
        n = len(dataset)
        for _ in range(epochs):
            order = rng.permutation(n)
            for k in range(0, n - batch_size + 1, batch_size):
                items = [dataset.load(int(i)) for i in order[k:k + batch_size]]
                batch = {
                    key: np.stack([it[key] for it in items])
                    for key in ("img", "ray", "w2c", "proj", "vertices", "albedo")
                }
                batch["faces"] = items[0]["faces"]
                q.put(batch)
        q.put(None)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        b = q.get()
        if b is None:
            return
        yield b


def _make_net(net_type, pe, feat_dim, mlp_width, mlp_depth):
    """(net module, init fn, apply fn) for 'mlp' or 'unet' heads.

    The UNet path is the dense [B, H, W, 284] forward of
    `train_unet.py:155-198` (input padded so 4 poolings divide evenly;
    the reference pads W to /8). BatchNorm stats are recomputed per batch
    and discarded, matching the reference's always-train-mode BN.
    """
    in_dim = pe.embedding_size * 3 + 3 + feat_dim
    if net_type == "mlp":
        net = RenderMLP(width=mlp_width, depth=mlp_depth)
        return (net,
                lambda rng: net.init(rng, jnp.zeros((1, in_dim))),
                lambda pp, x: net.apply(pp, x))
    from ..nn.unet import RenderUNet
    from .neural import pad_to_multiple

    net = RenderUNet(out_channels=3, feature_scale=2)

    def apply(pp, x):
        xp, crop = pad_to_multiple(x, 16)
        out = net.apply(pp, xp, mutable=["batch_stats"])[0]
        return out[:, crop[0], crop[1]]

    return (net,
            lambda rng: net.init(rng, jnp.zeros((1, 32, 32, in_dim))),
            apply)


def make_category_train_step(resolution, feat_dim=20, lr=1e-5,
                             mlp_width=256, mlp_depth=8, uni_mode="random",
                             net_type="mlp", raster_kw=None):
    """Jitted step for category-level training: (params, vf, opt_state,
    batch, rng) -> updated. Loss: 100-smooth-l1 on covered pixels
    (`train_mlp.py:273-278` / `train_unet.py:245-247` use plain
    smooth_l1; weight per `neural_render.py:152`). net_type 'mlp' or
    'unet' (`train_unet.py:200-257`)."""
    pe = IcosahedronEncoding(min_deg=0, max_deg=1, scale=0.1)
    net, net_init, net_apply = _make_net(
        net_type, pe, feat_dim, mlp_width, mlp_depth)
    opt = optax.adam(lr)

    def init(rng):
        net_params = net_init(rng)
        vf = jnp.zeros((NUM_VERTS, feat_dim))
        params = {"net": net_params, "vf": vf}
        return params, opt.init(params)

    def loss_fn(p, batch, rng):
        # per-sample meshes ride the rasterizer's VIEW axis (a batched
        # neural_forward) — NOT a vmap: the deferred Pallas core must
        # not sit under vmap, and one batched raster beats B small ones
        pred, masks = neural_forward(
            net_apply, p["net"], pe,
            batch["ray"], batch["w2c"], batch["proj"],
            batch["vertices"], batch["faces"], batch["albedo"],
            p["vf"], resolution, rng, uni_mode=uni_mode,
            raster_kw=raster_kw,
        )
        valid = (masks[..., 0] > 0).astype(jnp.float32)
        h = optax.huber_loss(pred, batch["img"], delta=1.0)
        return (jnp.sum(h * valid[..., None])
                / jnp.maximum(jnp.sum(valid) * 3.0, 1.0))

    @jax.jit
    def step(params, opt_state, batch, rng):
        loss, g = jax.value_and_grad(loss_fn)(params, batch, rng)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    return init, step, (net, pe, net_apply)


def category_eval(dataset, params, resolution, net_type="mlp", feat_dim=20,
                  mlp_width=256, mlp_depth=8, n_samples=10, seed=0,
                  out_dir=None, uni_mode="random", raster_kw=None):
    """Render `n_samples` random dataset entries with the frozen category
    renderer; returns mean metrics and writes pngs when out_dir is set.

    Parity: `train_mlp.py:286-320` / `train_unet.py:259-310` (random
    train-set indices, masked reference-PSNR + SSIM, per-image pngs).
    """
    from ..utils.metrics import psnr_reference, ssim

    pe = IcosahedronEncoding(min_deg=0, max_deg=1, scale=0.1)
    _, _, net_apply = _make_net(net_type, pe, feat_dim, mlp_width, mlp_depth)

    @jax.jit
    def render_one(net_p, vf, ray, w2c, proj, verts, faces, albedo, rng):
        return neural_forward(
            net_apply, net_p, pe, ray[None], w2c[None], proj[None],
            verts, faces, albedo, vf, resolution, rng, uni_mode=uni_mode,
            raster_kw=raster_kw)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    psnrs, ssims = [], []
    for i in range(n_samples):
        idx = int(rng.integers(0, len(dataset)))
        s = dataset.load(idx)
        key, sub = jax.random.split(key)
        pred, masks = render_one(
            params["net"], params["vf"], jnp.asarray(s["ray"]),
            jnp.asarray(s["w2c"]), jnp.asarray(s["proj"]),
            jnp.asarray(s["vertices"]), jnp.asarray(s["faces"]),
            jnp.asarray(s["albedo"]), sub)
        m = np.asarray(masks[0, ..., 0])
        pr = np.asarray(pred[0]) * m[..., None]
        gt = np.asarray(s["img"]) * m[..., None]
        psnrs.append(psnr_reference(gt, pr, m[..., None]))
        ssims.append(ssim(gt, pr))
        if out_dir is not None:
            import cv2

            os.makedirs(out_dir, exist_ok=True)
            cv2.imwrite(join(out_dir, f"{i}.png"),
                        (pr[..., ::-1] * 255).clip(0, 255).astype(np.uint8))
    return dict(psnr=float(np.mean(psnrs)), ssim=float(np.mean(ssims)))
