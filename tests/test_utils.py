"""Tests for config / metrics / obj_io / artifacts utilities."""

import numpy as np
import pytest

from fmhr_tpu.utils.config import parse_hocon, Config, load_config
from fmhr_tpu.utils.metrics import psnr, psnr_reference, ssim
from fmhr_tpu.utils.obj_io import load_obj, save_obj, save_obj_with_colors
from fmhr_tpu.utils import artifacts


def test_hocon_parse():
    text = """
    data_type = demo   # comment
    w = 1280
    lr = 0.0001
    drop_cam = "a,b,c"
    flag = true
    // full line comment
    """
    c = Config(parse_hocon(text))
    assert c.get_string("data_type") == "demo"
    assert c.get_int("w") == 1280
    assert abs(c.get_float("lr") - 1e-4) < 1e-12
    assert c.get_list("drop_cam") == ["a", "b", "c"]
    assert c.get_bool("flag") is True
    assert c.get_int("missing", 7) == 7
    with pytest.raises(KeyError):
        c.get_int("nope")


def test_reference_conf_files_parse():
    for name in ("demo_sfs", "ih_sfs", "ih_sfsseq"):
        c = load_config(f"conf/{name}.conf")
        assert c.get_int("degree") == 3
        assert c.get_float("sfs_weight") > 0


def test_psnr_formulas():
    rng = np.random.default_rng(0)
    a = rng.random((16, 16, 3))
    assert psnr(a, a) == float("inf")
    b = np.clip(a + 0.1, 0, 1)
    p = psnr(a, b)
    assert 15 < p < 30
    mask = np.ones((16, 16))
    pr = psnr_reference(a, b, mask)
    # 28/20 constant ratio vs standard formula on a full mask
    assert abs(pr / p - 1.4) < 0.05


def test_ssim_bounds():
    rng = np.random.default_rng(1)
    a = rng.random((32, 32, 3))
    assert ssim(a, a) > 0.999
    assert ssim(a, 1 - a) < 0.5


def test_obj_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    p = tmp_path / "m.obj"
    save_obj(str(p), v, f)
    v2, f2 = load_obj(str(p))
    np.testing.assert_allclose(v, v2, atol=1e-5)
    np.testing.assert_array_equal(f, f2)

    pc = tmp_path / "c.obj"
    save_obj_with_colors(str(pc), v, f, np.ones_like(v) * 0.5)
    v3, f3 = load_obj(str(pc))
    np.testing.assert_allclose(v, v3, atol=1e-3)
    # colored exporter flips the face winding (reference parity)
    np.testing.assert_array_equal(f3, [[0, 2, 1]])


def test_mano_out_roundtrip(tmp_path):
    hands = [
        {"type": "left", "pose": np.zeros(48, np.float32),
         "shape": np.zeros((1, 10), np.float32),
         "trans": np.zeros((1, 3), np.float32), "scale": 2.0},
        {"type": "right", "pose": np.ones(48, np.float32),
         "shape": np.ones((1, 10), np.float32),
         "Rt": np.eye(4, dtype=np.float32)},
    ]
    p = tmp_path / "mano.npz"
    artifacts.save_mano_out(str(p), hands)
    out = artifacts.load_mano_out(str(p))
    assert out[0]["type"] == "left" and out[1]["type"] == "right"
    np.testing.assert_allclose(out[1]["Rt"], np.eye(4))
    assert float(out[0]["scale"]) == 2.0


def test_mano_out_reads_torch_pt(tmp_path):
    torch = pytest.importorskip("torch")
    hands = [{"type": "left", "pose": torch.zeros(1, 48),
              "shape": torch.zeros(1, 10), "trans": torch.zeros(1, 3),
              "scale": 1.0}]
    p = tmp_path / "mano.pt"
    torch.save(hands, str(p))
    out = artifacts.load_mano_out(str(p))
    assert out[0]["type"] == "left"
    assert out[0]["pose"].shape == (1, 48)


def test_ham_out_roundtrip(tmp_path):
    p = tmp_path / "ham.npz"
    artifacts.save_ham_out(str(p), np.ones((4, 9)), np.zeros((10, 3)))
    d = artifacts.load_ham_out(str(p))
    assert d["sh_coeff"].shape == (4, 9)
    assert d["albedo"].shape == (10, 3)
