"""Neural-renderer CLI end-to-end on a synthetic demo-layout fixture:
train -> checkpoint -> eval (+mp4) -> continue_train resume -> eval_repose.

Parity targets: `/root/reference/neural_render.py` `train`/`eval`
(`:41-321`), `continue_train` (`:100-106`), `eval_repose` (`:323-501`),
`write2video` (`:503-510`).
"""

import os
from os.path import join

import numpy as np
import pytest

RES = 64           # native == working resolution
N_VIEWS = 2
SCANS = (1, 2)

CONF_TEXT = f"""
data_type = demo
input_mesh_dire = mano_out
out_mesh_dire = demo_sfs
num = {N_VIEWS}
w = {RES}
h = {RES}
"""


def _write_cameras(cam_dir, n, res):
    """param.npz in the demo layout: world_mat = K @ w2c, scale_mat = I."""
    f = res * 1.2
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    K[0, 2] = K[1, 2] = res / 2.0
    blob = {}
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = np.array([3.0 * np.cos(ang), 0.4, 3.0 * np.sin(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        dn = np.cross(fwd, right)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([right, dn, fwd])
        w2c[:3, 3] = -w2c[:3, :3] @ eye
        blob[f"world_mat_{i}"] = K @ w2c
        blob[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        blob[f"int_{i}"] = K
    np.savez(join(cam_dir, "param.npz"), **blob)


@pytest.fixture(scope="module")
def demo_fixture(tmp_path_factory):
    import cv2
    import jax.numpy as jnp

    from fmhr_tpu.body import synthetic_hand_model
    from fmhr_tpu.body.mano import lbs
    from fmhr_tpu.core.subdivision import subdivide_weights_loop
    from fmhr_tpu.utils.artifacts import save_ham_out, save_mano_out
    from fmhr_tpu.utils.obj_io import save_obj

    root = tmp_path_factory.mktemp("nr_cli")
    data = root / "demo_data"
    out = root / "demo_out"
    (out / "mano_out").mkdir(parents=True)

    model = synthetic_hand_model(is_rhand=True)
    model_path = str(root / "right.npz")
    model.save_npz(model_path)

    # Subdivided template + matching skinning weights (one loop round).
    v_t, f_sub, w_sub = subdivide_weights_loop(
        model.lbs_weights, model.v_template, model.faces.astype(np.int64), 1)

    rng = np.random.default_rng(0)
    for scan in SCANS:
        sdir = data / str(scan)
        for sub in ("camera", "img", "mask"):
            (sdir / sub).mkdir(parents=True)
        _write_cameras(str(sdir / "camera"), N_VIEWS, RES)
        for i in range(N_VIEWS):
            img = np.full((RES, RES, 3), 120, np.uint8)
            img[:, :, 1] = 160  # give the renderer something non-gray
            cv2.imwrite(str(sdir / "img" / f"{i:02d}.png"), img)
            cv2.imwrite(str(sdir / "mask" / f"{i:02d}.png"),
                        np.full((RES, RES, 3), 255, np.uint8))

        # Per-scan MANO params + the posed subdivided mesh (scaled 0.45
        # like the synthetic scenes so the ring cameras see it).
        pose = np.zeros(48, np.float32)
        if scan != SCANS[0]:
            pose[3:9] = rng.normal(size=6) * 0.1
        shape = np.zeros(10, np.float32)
        trans = np.zeros(3, np.float32)
        save_mano_out(str(out / "mano_out" / f"{scan}.npz"),
                      [{"type": "right", "pose": pose, "shape": shape,
                        "trans": trans, "scale": 0.45}])
        verts = np.asarray(lbs(
            model, jnp.asarray(pose)[None], jnp.asarray(shape)[None],
            jnp.asarray(w_sub), jnp.asarray(v_t, np.float32)[None])[0])
        verts = verts * 0.45 + trans

        ham_dir = out / "demo_sfs" / str(scan)
        ham_dir.mkdir(parents=True)
        save_obj(str(ham_dir / f"{scan}.obj"), verts, f_sub)
        save_ham_out(str(ham_dir / f"{scan}.npz"),
                     sh_coeff=np.tile(np.array(
                         [0.8, 0.1, 0, 0, 0, 0, 0, 0, 0], np.float32),
                         (N_VIEWS, 1)),
                     albedo=np.full((verts.shape[0], 3), 0.5, np.float32))

    conf = root / "nr_test.conf"
    conf.write_text(CONF_TEXT)
    return dict(root=root, data=str(data), conf=str(conf),
                model_path=model_path)


@pytest.mark.slow
def test_train_eval_repose_and_resume(demo_fixture, monkeypatch, capsys):
    from fmhr_tpu.cli.neural_render import train_and_eval

    monkeypatch.chdir(demo_fixture["root"])
    state, metrics = train_and_eval(
        demo_fixture["conf"], SCANS[0], demo_fixture["data"],
        net_type="mlp", num_epochs=2,
        repose_id=SCANS[1], mano_right=demo_fixture["model_path"])

    assert np.isfinite(metrics["psnr"]) and np.isfinite(metrics["ssim"])
    assert "repose" in metrics
    assert np.isfinite(metrics["repose"]["psnr"])

    in_dir = join("demo_out", "demo_sfs", str(SCANS[0]))
    assert os.path.exists(join(in_dir, f"final_{SCANS[0]}.obj"))
    assert os.path.exists(join(in_dir, f"render_{SCANS[0]}.mp4"))
    assert os.path.exists(join(in_dir, "rerender", f"nr_{SCANS[0]}_00.png"))
    rp = join(in_dir, "repose")
    assert os.path.exists(join(rp, f"repose_{SCANS[0]}_{SCANS[1]}.mp4"))
    assert os.path.exists(join(rp, f"repose_{SCANS[1]}_00.png"))
    ckpt = join(in_dir, "checkpoints", f"mlp_{SCANS[0]}_2.pkl")
    assert os.path.exists(ckpt)
    capsys.readouterr()

    # resume: same epochs key -> loads the checkpoint just written
    state2, metrics2 = train_and_eval(
        demo_fixture["conf"], SCANS[0], demo_fixture["data"],
        net_type="mlp", num_epochs=2, continue_train=True)
    assert "continue_train: resuming" in capsys.readouterr().out
    assert np.isfinite(metrics2["psnr"])
