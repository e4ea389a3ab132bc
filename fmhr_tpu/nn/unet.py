"""Rendering UNet with partial convolutions.

Parity: `/root/reference/models/unet.py:256-398` as instantiated by the
neural renderer: `UNet(284, 3, feature_scale=2, more_layers=0)` with
partial-conv blocks, bilinear upsampling, BatchNorm and a sigmoid output
(`neural_render.py:68`). The reference's multi-scale extra input slots
(unused by the release instantiation) are carried via
`extra_in_channels`. BatchNorm runs in "train" mode statistics-free (use_running_average
False) just like the reference's default train() usage.

Partial convolution (`models/unet.py:56-130`): convolve input*mask, then
renormalize by the fraction of valid mask inside each window and re-add
the bias; the mask propagates via max-pooling of coverage.
"""

from __future__ import annotations

import flax.linen as fnn
import jax
import jax.numpy as jnp


class PartialConv(fnn.Module):
    features: int
    kernel: int = 3

    @fnn.compact
    def __call__(self, x, mask):
        """x [B, H, W, C]; mask [B, H, W, 1] (1 = valid)."""
        k = self.kernel
        # bias-free conv + manual bias so the mask renormalization applies
        # to the convolution only (reference subtracts/re-adds the bias,
        # `models/unet.py:120-123` — algebraically identical).
        raw = fnn.Conv(self.features, (k, k), padding="SAME", use_bias=False)(
            x * mask
        )
        bias = self.param("bias", fnn.initializers.zeros, (self.features,))
        # window-valid counts via a ones-kernel convolution of the mask
        win = jax.lax.conv_general_dilated(
            mask, jnp.ones((k, k, 1, 1), x.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ratio = (k * k) / (win + 1e-8)
        update = jnp.clip(win, 0.0, 1.0)
        out = (raw * ratio + bias) * update
        return out, update


class PartialBlock(fnn.Module):
    features: int

    @fnn.compact
    def __call__(self, x, mask, train: bool = True):
        x, new_mask = PartialConv(self.features)(x, mask)
        x = fnn.BatchNorm(use_running_average=not train)(x)
        x = fnn.relu(x)
        x = fnn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = fnn.BatchNorm(use_running_average=not train)(x)
        x = fnn.relu(x)
        return x, new_mask


class RenderUNet(fnn.Module):
    """4-level UNet, feature_scale=2 -> filters (32, 64, 128, 256, 512).

    `extra_in_channels` declares the reference's multi-scale input slots
    (`models/unet.py:287-292,310-313,344-380`): entry k is the channel
    count of an extra input at 1/2^(k+1) resolution, concatenated after
    that level's down block (whose width shrinks by the same amount so
    the level still totals filters[k+1] channels). The release
    instantiation uses none (`neural_render.py:68`)."""

    out_channels: int = 3
    feature_scale: int = 2
    extra_in_channels: tuple = ()   # levels 1..4, like num_input_channels[1:]

    @fnn.compact
    def __call__(self, x, train: bool = True):
        """x [B, H, W, C_in], or a list of arrays (main input + one per
        declared extra slot, each at 1/2^(k+1) resolution); H, W must be
        multiples of 16 (4 poolings) — the caller pads (the reference pads
        W to /8, `train_unet.py:192-196`). Mask = any-channel-nonzero, as
        the reference derives it (`models/unet.py:346-347`)."""
        inputs = list(x) if isinstance(x, (list, tuple)) else [x]
        extra = list(self.extra_in_channels) + [0] * (
            4 - len(self.extra_in_channels))
        n_declared = 1 + sum(1 for c in extra if c)
        if len(inputs) != n_declared:
            raise ValueError(
                f"got {len(inputs)} input scales but declared {n_declared}")
        x = inputs[0]

        def any_mask(a):
            return (jnp.sum(jnp.abs(a), axis=-1, keepdims=True)
                    > 1e-9).astype(a.dtype)

        filters = [f // self.feature_scale for f in (64, 128, 256, 512, 1024)]
        mask = any_mask(x)

        in64, m = PartialBlock(filters[0])(x, mask, train)

        skips = [in64]
        h, hm = in64, m
        idx_in = 1
        for lvl in range(4):
            h = fnn.avg_pool(h, (2, 2), strides=(2, 2))
            hm = fnn.max_pool(hm, (2, 2), strides=(2, 2))
            if extra[lvl]:
                # reference quirk kept: the down block's partial conv uses
                # the slot input's OWN mask, not the propagated coverage
                # (`models/unet.py:359-369`)
                hm = any_mask(inputs[idx_in])
            h, hm = PartialBlock(filters[lvl + 1] - extra[lvl])(h, hm, train)
            if extra[lvl]:
                h = jnp.concatenate([h, inputs[idx_in]], axis=-1)
                idx_in += 1
            if lvl < 3:
                skips.append(h)

        for lvl in range(3, -1, -1):
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "bilinear")
            h = fnn.Conv(filters[lvl], (3, 3), padding="SAME")(h)
            skip = skips[lvl]
            h = jnp.concatenate([h, skip], axis=-1)
            hmask = (jnp.sum(jnp.abs(h), -1, keepdims=True) > 1e-9).astype(x.dtype)
            h, _ = PartialBlock(filters[lvl])(h, hmask, train)

        out = fnn.Conv(self.out_channels, (1, 1))(h)
        return fnn.sigmoid(out)
