"""CLI: minimal end-to-end slice — silhouette+photometric fit on demo data.

BASELINE.json config #1: "Single-view 256² MANO silhouette+photometric fit
on demo_data/1 (CPU-runnable ref)". Fits the articulated hand model's
global pose/translation/scale + per-joint pose to the real captured mask
of one demo view, driven purely by the differentiable rasterizer's
antialias silhouette gradients. Uses the synthetic hand stand-in when no
converted MANO .npz is given (MANO assets are user-supplied,
reference README.md:46-48).

    python -m fmhr_tpu.cli.fit_demo --data_path /root/reference/demo_data \
        --steps 100 --res 256 --platform cpu
"""

from __future__ import annotations

import argparse

from ._common import platform_arg, apply_platform


def main(data_path: str, scan_id: int = 1, view: int = 0, res: int = 256,
         steps: int = 100, mano_npz: str | None = None, out: str | None = None):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    import cv2

    from ..body import synthetic_hand_model, mano_forward
    from ..body.mano import ManoModel
    from ..core.cameras import camera_matrices_from_P
    from ..optim.ham import project_verts
    from ..raster import rasterize, interpolate, antialias, AATopology

    model = (ManoModel.load_npz(mano_npz) if mano_npz
             else synthetic_hand_model())
    faces = model.faces

    cam = np.load(f"{data_path}/{scan_id}/camera/param.npz")
    P = (cam[f"world_mat_{view}"] @ cam[f"scale_mat_{view}"])[:3]
    mask_img = cv2.imread(f"{data_path}/{scan_id}/mask/{view:02d}.png")[:, :, 0]
    full_h, full_w = mask_img.shape
    mask = cv2.resize((mask_img > 127.5).astype(np.float32), (res, res),
                      interpolation=cv2.INTER_NEAREST)
    # NDC projection is built at the calibration resolution; raster at res.
    w2c_T, proj_T = camera_matrices_from_P(P, full_w, full_h)
    w2cs = jnp.asarray(w2c_T)[None]
    projs = jnp.asarray(proj_T)[None]
    target = jnp.asarray(mask)

    k3d = np.loadtxt(f"{data_path}/{scan_id}/keypoints_3d_{scan_id}.xyz")
    center = jnp.asarray(k3d.mean(0), jnp.float32)

    topo_aa = AATopology.build(faces, model.num_vertices)
    ones_attr = jnp.ones((model.num_vertices, 1))

    params = {
        "trans": center,
        "log_scale": jnp.asarray(np.log(0.25), jnp.float32),
        "orient": jnp.zeros(3),
        "pose": jnp.zeros(45),
    }
    opt = optax.adam(2e-2)

    def render_mask(p):
        verts, _ = mano_forward(
            model, p["orient"][None], p["pose"][None], jnp.zeros((1, 10)),
            apply_pose_blend=False,
        )
        verts = verts[0] * jnp.exp(p["log_scale"]) + p["trans"]
        clip = project_verts(verts, w2cs, projs)
        rast = rasterize(clip, faces, (res, res))
        m = interpolate(ones_attr, rast, faces)
        return antialias(m, rast, clip, faces, topo_aa)[..., 0][0]

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda pp: jnp.mean((render_mask(pp) - target) ** 2)
        )(p)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, loss

    state = opt.init(params)
    losses = []
    for i in range(steps):
        params, state, loss = step(params, state)
        if i % max(1, steps // 10) == 0 or i == steps - 1:
            losses.append(float(loss))
            print(f"step {i:4d} silhouette mse {losses[-1]:.5f}")

    final = np.asarray(render_mask(params))
    if out:
        cv2.imwrite(out, np.concatenate(
            [final, np.asarray(target)], 1) * 255)
        print("wrote", out)
    assert losses[-1] < losses[0], "fit must reduce the silhouette loss"
    print(f"fit OK: {losses[0]:.5f} -> {losses[-1]:.5f}")
    return params, losses


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default="/root/reference/demo_data")
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--view", type=int, default=0)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--mano_npz", default=None)
    ap.add_argument("--out", default=None)
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    main(args.data_path, args.scan_id, args.view, args.res, args.steps,
         args.mano_npz, args.out)
