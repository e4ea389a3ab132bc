"""CLI smoke tests (subprocess, real demo data when available)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import reference_available

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m"] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=420,
    )


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="demo data not mounted")
def test_pose_optim_cli(tmp_path):
    r = _run(
        ["fmhr_tpu.cli.pose_optim", "--data_path", "/root/reference/demo_data",
         "--scan_id", "1", "--epochs", "150", "--platform", "cpu"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "demo_out/keypoints3d/keypoints_3d_1.xyz"
    assert out.exists()
    k = np.loadtxt(out)
    assert k.shape == (42, 3)


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="demo data not mounted")
def test_fit_demo_cli(tmp_path):
    r = _run(
        # 128/60: at 96px the watertight template's thin fingers make
        # the silhouette loss noisy for the first ~2 dozen Adam steps
        # (round 5); at 128px/60 steps the fit descends reliably
        ["fmhr_tpu.cli.fit_demo", "--data_path", "/root/reference/demo_data",
         "--steps", "60", "--res", "128", "--platform", "cpu"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fit OK" in r.stdout


def test_bench_cli(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--preset",
         "tiny", "--platform", "cpu"],
        cwd=tmp_path, capture_output=True, text=True, timeout=420,
        env={**os.environ,
             "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
             "FMHR_BENCH_ATTEMPTS": "1"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["unit"] == "Mrays/s" and out["value"] > 0


@pytest.mark.slow
def test_sap_recon_cli(tmp_path):
    # octahedron subdivided to a sphere -> SAP watertight reconstruction
    from fmhr_tpu.utils.obj_io import save_obj, load_obj
    from fmhr_tpu.core.subdivision import loop_subdivide

    verts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
         [0, 0, 1], [0, 0, -1]], np.float32)
    faces = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    v, f = verts, faces
    for _ in range(2):
        v, f = loop_subdivide(v, f)[:2]
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * 0.4
    mesh = tmp_path / "sphere.obj"
    save_obj(str(mesh), v, f)
    r = _run(
        ["fmhr_tpu.cli.sap_recon", "--mesh", str(mesh), "--res", "32",
         "--num_sample", "2000", "--platform", "cpu"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sap_recon OK" in r.stdout
    rv, rf = load_obj(str(tmp_path / "sphere_sap.obj"))
    rad = np.linalg.norm(rv, axis=1)
    assert abs(rad.mean() - 0.4) < 0.05
