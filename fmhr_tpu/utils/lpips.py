"""LPIPS perceptual metric (AlexNet backbone) in JAX.

Parity role: `lpips.LPIPS(net='alex')` used at eval time only
(`/root/reference/neural_render.py:29,309`). The metric needs pretrained
AlexNet + linear-head weights, which are downloadable assets (like MANO
pickles); `convert_lpips_weights` turns the torch checkpoints into an
.npz once, and `LPIPSAlex` evaluates from it. Without a weights file the
metric is unavailable (evaluators fall back to PSNR/SSIM, which is also
what the reference reports alongside).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature config: (out_channels, kernel, stride, padding)
_ALEX_LAYERS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# max-pool after layers 0, 1 (and relu everywhere)
_POOL_AFTER = {0, 1}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSAlex:
    def __init__(self, weights_path: str):
        d = np.load(weights_path)
        self.convs = [
            (jnp.asarray(d[f"conv{i}_w"]), jnp.asarray(d[f"conv{i}_b"]))
            for i in range(5)
        ]
        self.lins = [jnp.asarray(d[f"lin{i}_w"]) for i in range(5)]

    def _features(self, x):
        """x [B, H, W, 3] (already in the lpips input range) -> 5 taps."""
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        feats = []
        h = x
        for i, (w, b) in enumerate(self.convs):
            stride = _ALEX_LAYERS[i][2]
            pad = _ALEX_LAYERS[i][3]
            h = jax.lax.conv_general_dilated(
                h, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jax.nn.relu(h)
            feats.append(h)
            if i in _POOL_AFTER:
                h = -jax.lax.reduce_window(
                    -h, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID",
                )
        return feats

    def __call__(self, img1, img2, normalize: bool = False) -> jax.Array:
        """[B, H, W, 3] pair -> [B] LPIPS distances.

        normalize=True rescales [0, 1] inputs to lpips's native [-1, 1];
        the default False matches the reference's eval, which feeds [0, 1]
        images straight into `lpips.LPIPS(net='alex')`
        (`neural_render.py:309` — bug-for-bug parity).
        """
        img1 = jnp.asarray(img1, jnp.float32)
        img2 = jnp.asarray(img2, jnp.float32)
        if normalize:
            img1 = img1 * 2.0 - 1.0
            img2 = img2 * 2.0 - 1.0
        f1 = self._features(img1)
        f2 = self._features(img2)
        total = 0.0
        for a, b, lin in zip(f1, f2, self.lins):
            # lpips.normalize_tensor: x / (||x||_2 + eps), eps OUTSIDE the
            # sqrt (`lpips/__init__.py` normalize_tensor)
            na = a / (jnp.sqrt(jnp.sum(a * a, -1, keepdims=True)) + 1e-10)
            nb = b / (jnp.sqrt(jnp.sum(b * b, -1, keepdims=True)) + 1e-10)
            diff = (na - nb) ** 2
            # 1x1 linear head then spatial mean
            wdiff = jnp.einsum("bhwc,c->bhw", diff, lin)
            total = total + jnp.mean(wdiff, axis=(1, 2))
        return total


def convert_lpips_weights(alexnet_pth: str, lpips_pth: str, out_npz: str):
    """Convert torchvision alexnet.features + lpips linear heads to npz."""
    import torch

    alex = torch.load(alexnet_pth, map_location="cpu", weights_only=False)
    if hasattr(alex, "state_dict"):
        alex = alex.state_dict()
    lin = torch.load(lpips_pth, map_location="cpu", weights_only=False)
    out = {}
    conv_ids = [0, 3, 6, 8, 10]  # indices in torchvision features
    for i, ci in enumerate(conv_ids):
        w = alex[f"features.{ci}.weight"].numpy()  # [O, I, kh, kw]
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{i}_b"] = alex[f"features.{ci}.bias"].numpy()
    for i in range(5):
        out[f"lin{i}_w"] = lin[f"lin{i}.model.1.weight"].numpy().reshape(-1)
    np.savez(out_npz, **out)
