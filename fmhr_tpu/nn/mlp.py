"""Per-pixel rendering MLP head.

Parity: `/root/reference/train_mlp.py:24-41`: depth x width ReLU MLP with
a sigmoid output, applied per covered pixel. On TPU the pixel batch is a
large [P, 284] x [284, 256] matmul chain — pure MXU work; we run it over
the DENSE pixel grid (masked), which XLA fuses with the interpolation
instead of the reference's boolean-gather/scatter round trip
(`train_mlp.py:193-203`).
"""

from __future__ import annotations

import flax.linen as fnn
import jax.numpy as jnp


class RenderMLP(fnn.Module):
    out_channels: int = 3
    width: int = 256
    depth: int = 8

    @fnn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = fnn.Dense(self.width, name=f"linear{i + 1}")(x)
            x = fnn.relu(x)
        x = fnn.Dense(self.out_channels, name=f"linear{self.depth}")(x)
        return fnn.sigmoid(x)
