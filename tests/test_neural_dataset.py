"""Category-level trainer: jitted step over varying meshes + prefetcher."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import fmhr_tpu.optim.neural_dataset as nd
from fmhr_tpu.data.synthetic import hand_scene


def test_category_step_runs_and_learns(monkeypatch):
    # shrink category sizes for the test
    monkeypatch.setattr(nd, "NUM_VERTS", 294)
    res = 32
    verts, faces, w2cs, projs = hand_scene(res=res, n_views=4)
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.random((2, res, res, 3)).astype(np.float32),
        "ray": np.broadcast_to(np.array([0, 0, 1], np.float32),
                               (2, res, res, 3)).copy(),
        "w2c": w2cs[:2].astype(np.float32),
        "proj": projs[:2].astype(np.float32),
        "vertices": np.stack([verts, verts * 1.01]).astype(np.float32),
        "albedo": np.full((2, verts.shape[0], 3), 0.5, np.float32),
        "faces": faces,
    }
    init2, step2, _ = nd.make_category_train_step(
        (res, res), mlp_width=32, mlp_depth=3, lr=1e-3
    )
    p2, _ = init2(jax.random.PRNGKey(0))
    # match the shrunken vertex-feature table to the tiny test mesh
    p2["vf"] = jnp.zeros((verts.shape[0], 20))
    import optax
    s2 = optax.adam(1e-3).init(p2)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(6):
        key, sub = jax.random.split(key)
        p2, s2, loss = step2(p2, s2, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_category_step_unet(monkeypatch):
    """UNet head over the dense [B, H, W, 284] path
    (`train_unet.py:200-257`)."""
    monkeypatch.setattr(nd, "NUM_VERTS", 294)
    res = 32
    verts, faces, w2cs, projs = hand_scene(res=res, n_views=2)
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.random((2, res, res, 3)).astype(np.float32),
        "ray": np.broadcast_to(np.array([0, 0, 1], np.float32),
                               (2, res, res, 3)).copy(),
        "w2c": w2cs.astype(np.float32),
        "proj": projs.astype(np.float32),
        "vertices": np.stack([verts, verts * 1.01]).astype(np.float32),
        "albedo": np.full((2, verts.shape[0], 3), 0.5, np.float32),
        "faces": faces,
    }
    init_u, step_u, _ = nd.make_category_train_step(
        (res, res), net_type="unet", lr=1e-3)
    p, _ = init_u(jax.random.PRNGKey(0))
    p["vf"] = jnp.zeros((verts.shape[0], 20))
    import optax
    s = optax.adam(1e-3).init(p)

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        p, s, loss = step_u(p, s, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("net_type", ["mlp", "unet"])
def test_category_eval(net_type, monkeypatch, tmp_path):
    """Frozen-net eval loop (`train_mlp.py:286-320`,
    `train_unet.py:259-310`): finite masked PSNR/SSIM + pngs."""
    monkeypatch.setattr(nd, "NUM_VERTS", 294)
    res = 32
    verts, faces, w2cs, projs = hand_scene(res=res, n_views=2)

    class Tiny:
        def __len__(self):
            return 2

        def load(self, i):
            return {
                "img": np.full((res, res, 3), 0.5, np.float32),
                "ray": np.broadcast_to(
                    np.array([0, 0, 1], np.float32), (res, res, 3)).copy(),
                "w2c": w2cs[i].astype(np.float32),
                "proj": projs[i].astype(np.float32),
                "vertices": verts.astype(np.float32),
                "albedo": np.full((verts.shape[0], 3), 0.5, np.float32),
                "faces": faces,
            }

    kw = dict(mlp_width=32, mlp_depth=3) if net_type == "mlp" else {}
    init_f, _, _ = nd.make_category_train_step(
        (res, res), net_type=net_type, **kw)
    params, _ = init_f(jax.random.PRNGKey(0))
    params["vf"] = jnp.zeros((verts.shape[0], 20))
    out_dir = str(tmp_path / "eval")
    m = nd.category_eval(Tiny(), params, (res, res), net_type=net_type,
                         n_samples=2, out_dir=out_dir, **kw)
    assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])
    import os
    assert os.path.exists(os.path.join(out_dir, "0.png"))


def test_prefetch_batches_synthetic():
    class Tiny:
        def __init__(self):
            self.n = 6

        def __len__(self):
            return self.n

        def load(self, i):
            return {
                "img": np.full((4, 4, 3), i, np.float32),
                "ray": np.zeros((4, 4, 3), np.float32),
                "w2c": np.eye(4, dtype=np.float32),
                "proj": np.eye(4, dtype=np.float32),
                "vertices": np.zeros((5, 3), np.float32),
                "albedo": np.zeros((5, 3), np.float32),
                "feature": np.zeros((5, 20), np.float32),
                "faces": np.zeros((3, 3), np.int32),
            }

    batches = list(nd.prefetch_batches(Tiny(), batch_size=2, epochs=2, seed=0))
    assert len(batches) == 6  # 3 per epoch x 2
    assert batches[0]["img"].shape == (2, 4, 4, 3)
