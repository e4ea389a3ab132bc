"""InterHand HAM driver end-to-end on a synthetic InterHand2.6M-layout
fixture (annotations JSON + images written by the test).

Parity target: `/root/reference/mesh_sfs_optim.py:92-118` (interhand
branch) and the warm-started sequence mode of `conf/ih_sfsseq.conf`.
"""

import json
import os
from os.path import join

import numpy as np
import pytest

W_RES, H_RES = 96, 128  # conf w, h (keeps CPU runtime sane)
CAMS = ["cam400002", "cam400004", "cam400013"]
CAPTURE = "Capture0"
DATA_NAME = "0002_good_luck"

CONF_TEXT = f"""
data_type = interhand
data_name = {DATA_NAME}
capture_name = {CAPTURE}
split = train
drop_cam = ""
input_mesh_dire = gcn_out
out_mesh_dire = demo_sfs
num = 3
w = {W_RES}
h = {H_RES}
epoch_albedo = 2
epoch_sfs = 2
sfs_weight = 30
albedo_weight = 0
lap_weight = 1000
mask_weight = 200
edge_weight = 100000
delta_weight = 10000
degree = 3
batch = 2
albedo_lr = 0.02
lr = 0.0005
sh_lr = 0.005
subdiv_iters = 1
"""


@pytest.fixture(scope="module")
def interhand_fixture(tmp_path_factory):
    import cv2
    from fmhr_tpu.body import synthetic_hand_model

    root = tmp_path_factory.mktemp("ih_data")
    ann = root / "annotations" / "train"
    ann.mkdir(parents=True)

    # cameras on a ring (InterHand convention: campos mm, camrot w2c)
    f_px = 1.2 * min(W_RES, H_RES)
    campos, camrot, focal, princpt = {}, {}, {}, {}
    for i, cam in enumerate(CAMS):
        idx = cam.replace("cam", "")
        ang = 2 * np.pi * i / len(CAMS)
        eye = np.array([3.0 * np.cos(ang), 0.4, 3.0 * np.sin(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        dn = np.cross(fwd, right)
        R = np.stack([right, dn, fwd])
        campos[idx] = (eye * 1000.0).tolist()
        camrot[idx] = R.tolist()
        focal[idx] = [f_px, f_px]
        princpt[idx] = [W_RES / 2.0, H_RES / 2.0]
    cam_json = {"0": {"campos": campos, "camrot": camrot,
                      "focal": focal, "princpt": princpt}}
    with open(ann / "InterHand2.6M_train_camera.json", "w") as f:
        json.dump(cam_json, f)

    # MANO annotations for 2 frames (slight per-frame motion)
    mano_json = {"0": {}}
    rng = np.random.default_rng(0)
    for frame in (1, 2):
        entry = {}
        for hand in ("left", "right"):
            pose = (rng.normal(size=48) * 0.02).astype(float)
            trans = [0.25 if hand == "right" else -0.25,
                     0.02 * frame, 0.0]
            entry[hand] = {
                "pose": pose.tolist(),
                "shape": (rng.normal(size=10) * 0.01).tolist(),
                "trans": trans,
            }
        mano_json["0"][str(frame)] = entry
    with open(ann / "InterHand2.6M_train_MANO_NeuralAnnot.json", "w") as f:
        json.dump(mano_json, f)

    # images: mid-gray frames (masked by the loader's rasterized masks)
    for cam in CAMS:
        d = root / "images" / "train" / CAPTURE / DATA_NAME / cam
        d.mkdir(parents=True)
        img = np.full((H_RES, W_RES, 3), 128, np.uint8)
        for frame in range(0, 3):
            cv2.imwrite(str(d / f"image{frame:05d}.jpg"), img)

    # converted MANO model files
    models = root / "models"
    models.mkdir()
    synthetic_hand_model(is_rhand=False).save_npz(str(models / "left.npz"))
    synthetic_hand_model(is_rhand=True).save_npz(str(models / "right.npz"))

    conf = root / "ih_test.conf"
    conf.write_text(CONF_TEXT)
    return root


def test_interhand_loader(interhand_fixture):
    from fmhr_tpu.body.mano import ManoModel
    from fmhr_tpu.data.interhand import load_interhand_scan

    root = str(interhand_fixture)
    models = {
        "left": ManoModel.load_npz(join(root, "models/left.npz")),
        "right": ManoModel.load_npz(join(root, "models/right.npz")),
    }
    scan = load_interhand_scan(root, 1, models, res=(W_RES, H_RES),
                               data_name=DATA_NAME, capture_name=CAPTURE)
    assert scan.imgs.shape == (len(CAMS), H_RES, W_RES, 3)
    assert scan.masks.shape == (len(CAMS), H_RES, W_RES)
    assert len(scan.mano_out) == 2
    # masks must actually cover some pixels in every view (cameras see
    # the hands)
    per_view = scan.masks.reshape(len(CAMS), -1).sum(1)
    assert (per_view > 50).all(), per_view


def test_multihands_interhand(interhand_fixture, tmp_path, monkeypatch):
    """Interhand data-type branch of the multihands orchestrator
    (`/root/reference/multihands_mano.py:218-243`): 2D keypoint JSONs per
    camera -> triangulation -> two-hand MANO fit -> mano_out artifacts."""
    import jax.numpy as jnp
    import json as _json

    from fmhr_tpu.body.mano import ManoModel, mano_forward, joints21
    from fmhr_tpu.cli.multihands import mano_from_mvimages
    from fmhr_tpu.data.interhand import interhand_camera
    from fmhr_tpu.optim.ham import project_verts
    from fmhr_tpu.utils.artifacts import load_mano_out

    root = str(interhand_fixture)
    models = {
        "left": ManoModel.load_npz(join(root, "models/left.npz")),
        "right": ManoModel.load_npz(join(root, "models/right.npz")),
    }
    with open(join(root, "annotations/train",
                   "InterHand2.6M_train_camera.json")) as f:
        cam_param = _json.load(f)["0"]
    with open(join(root, "annotations/train",
                   "InterHand2.6M_train_MANO_NeuralAnnot.json")) as f:
        mano_ann = _json.load(f)["0"]["1"]

    # ground-truth 21-keypoint sets from the fixture's MANO annotations
    k3d = []
    for hand in ("left", "right"):
        p = np.asarray(mano_ann[hand]["pose"], np.float32)
        sh = np.asarray(mano_ann[hand]["shape"], np.float32)
        tr = np.asarray(mano_ann[hand]["trans"], np.float32)
        v, j16 = mano_forward(
            models[hand], jnp.asarray(p[:3])[None],
            jnp.asarray(p[3:])[None], jnp.asarray(sh)[None],
            transl=jnp.asarray(tr)[None], use_pca=False)
        k3d.append(np.asarray(joints21(models[hand], v, j16)[0]))
    k3d = np.concatenate(k3d)  # [42, 3]

    # exact 2D keypoints: project through each camera to NDC
    pose_dir = tmp_path / "pose2d"
    pose_dir.mkdir()
    for cam in CAMS:
        w2c_T, proj_T = interhand_camera(
            cam_param, cam.replace("cam", ""), (W_RES, H_RES))
        clip = np.asarray(project_verts(
            jnp.asarray(k3d), jnp.asarray(w2c_T)[None],
            jnp.asarray(proj_T)[None]))[0]
        ndc = clip[:, :2] / clip[:, 3:4]
        kp = np.concatenate([ndc, np.zeros((42, 1), np.float32)], 1)
        with open(pose_dir / f"{cam}.json", "w") as f:
            _json.dump({"Left": kp[:21].reshape(-1).tolist(),
                        "Right": kp[21:].reshape(-1).tolist()}, f)

    monkeypatch.chdir(tmp_path)
    mano_from_mvimages(
        root, 1, mano_left=join(root, "models/left.npz"),
        mano_right=join(root, "models/right.npz"),
        data_type="interhand", data_name=DATA_NAME,
        capture_name=CAPTURE, res=(W_RES, H_RES),
        pose_dir=str(pose_dir))

    out_dir = join(str(tmp_path), "interhand_out",
                   f"{CAPTURE}_{DATA_NAME}")
    k3d_rec = np.loadtxt(join(out_dir, "keypoints3d/keypoints_3d_1.xyz"))
    assert k3d_rec.shape == (42, 3)
    # triangulation from exact projections recovers the 3D keypoints
    assert np.abs(k3d_rec - k3d).mean() < 0.05
    hands = load_mano_out(join(out_dir, "mano_out/1.npz"))
    assert {h["type"] for h in hands} == {"left", "right"}
    assert os.path.exists(join(out_dir, "mano_out/1.obj"))


def test_interhand_ham_sequence(interhand_fixture, tmp_path, monkeypatch):
    """Two warm-started frames through the full interhand HAM driver."""
    from fmhr_tpu.cli.mesh_sfs import main
    from fmhr_tpu.utils.artifacts import load_ham_out

    root = str(interhand_fixture)
    monkeypatch.chdir(tmp_path)
    out = main(join(root, "ih_test.conf"), 1, root,
               mano_left=join(root, "models/left.npz"),
               mano_right=join(root, "models/right.npz"),
               frames=2)

    assert np.isfinite(float(out["losses_sfs"][-1]))
    out_dir = join(str(tmp_path), "interhand_out",
                   f"{CAPTURE}_{DATA_NAME}")
    for frame in (1, 2):
        assert os.path.exists(join(out_dir, f"ori_{frame}.obj"))
        assert os.path.exists(join(out_dir, f"{frame}.obj"))
        assert os.path.exists(join(out_dir, f"{frame}_c.obj"))
        ham = load_ham_out(join(out_dir, f"{frame}.npz"))
        assert ham["albedo"].shape[1] == 3
        assert np.isfinite(ham["albedo"]).all()
        assert np.isfinite(ham["sh_coeff"]).all()


def test_interhand_neural_render_holdout(interhand_fixture, tmp_path,
                                         monkeypatch):
    """NR interhand branch + held-out novel-view eval (VERDICT r2 #3):
    `data_type=interhand` in the NR CLI trains on the scan minus
    `--holdout_cams`, then scores the val-style view set from
    `load_interhand_eval_views` (= get_valinterhand_data,
    `/root/reference/neural_render.py:84,255-321,515-586`) and reports
    the held-out-camera subset separately."""
    from fmhr_tpu.cli.mesh_sfs import main as ham_main
    from fmhr_tpu.cli.neural_render import train_and_eval

    root = str(interhand_fixture)
    monkeypatch.chdir(tmp_path)
    # HAM first: NR consumes interhand_out/<capture>_<data>/{1.obj,1.npz}
    ham_main(join(root, "ih_test.conf"), 1, root,
             mano_left=join(root, "models/left.npz"),
             mano_right=join(root, "models/right.npz"))

    holdout = (CAMS[-1],)
    state, metrics = train_and_eval(
        join(root, "ih_test.conf"), 1, root, net_type="mlp",
        num_epochs=2, mano_left=join(root, "models/left.npz"),
        mano_right=join(root, "models/right.npz"),
        holdout_cams=holdout)

    assert np.isfinite(metrics["psnr"])
    assert "holdout" in metrics
    for key in ("psnr", "ref_psnr", "ssim"):
        assert np.isfinite(metrics["holdout"][key]), key
    out_dir = join(str(tmp_path), "interhand_out",
                   f"{CAPTURE}_{DATA_NAME}")
    # eval renders cover ALL cameras (incl. the held-out one)
    renders = os.listdir(join(out_dir, "rerender"))
    assert len([r for r in renders if r.startswith("nr_")]) == len(CAMS)
    # checkpoint written under the interhand out tree
    assert os.path.exists(join(out_dir, "checkpoints", "mlp_1_2.pkl"))


def test_interhand_neural_render_repose(interhand_fixture, tmp_path,
                                        monkeypatch):
    """NR interhand repose branch (`neural_render.py:369-397`): re-animate
    the trained frame-1 avatar to frame 2's MANO pose and score it."""
    from fmhr_tpu.cli.mesh_sfs import main as ham_main
    from fmhr_tpu.cli.neural_render import train_and_eval

    root = str(interhand_fixture)
    monkeypatch.chdir(tmp_path)
    ham_main(join(root, "ih_test.conf"), 1, root,
             mano_left=join(root, "models/left.npz"),
             mano_right=join(root, "models/right.npz"),
             frames=2)

    state, metrics = train_and_eval(
        join(root, "ih_test.conf"), 1, root, net_type="mlp",
        num_epochs=2, mano_left=join(root, "models/left.npz"),
        mano_right=join(root, "models/right.npz"),
        repose_id=2)

    assert "repose" in metrics
    assert np.isfinite(metrics["repose"]["psnr"])
    out_dir = join(str(tmp_path), "interhand_out",
                   f"{CAPTURE}_{DATA_NAME}")
    repose_dir = join(out_dir, "repose")
    assert os.path.isdir(repose_dir)
    assert any(r.startswith("repose_") for r in os.listdir(repose_dir))
