"""Icosahedron-direction positional encoding.

Parity: `/root/reference/models/PostionalEncoding.py:42-130`: project the
3-vector onto 21 fixed icosahedral directions, then sin at the frequency
bands (and the same shifted by pi/2, i.e. cos), concatenated after the
raw input. With min_deg=0, max_deg=1 (the renderer setting,
`train_mlp.py:224`): 3 + 2*21*2 = 87 output channels.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# 21 icosahedral directions, verbatim constants from the reference
# (`models/PostionalEncoding.py:59-81`) — these are data, not code.
ICOSAHEDRON_DIRS = np.array([
    [0.8506508, 0.0, 0.5257311],
    [0.809017, 0.5, 0.309017],
    [0.5257311, 0.8506508, 0.0],
    [1.0, 0.0, 0.0],
    [0.809017, 0.5, -0.309017],
    [0.8506508, 0.0, -0.5257311],
    [0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, -0.8506508],
    [0.5, 0.309017, -0.809017],
    [0.0, 1.0, 0.0],
    [-0.5257311, 0.8506508, 0.0],
    [-0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, 0.8506508],
    [-0.309017, 0.809017, 0.5],
    [0.309017, 0.809017, 0.5],
    [0.5, 0.309017, 0.809017],
    [0.5, -0.309017, 0.809017],
    [0.0, 0.0, 1.0],
    [-0.5, 0.309017, 0.809017],
    [-0.809017, 0.5, 0.309017],
    [-0.809017, 0.5, -0.309017],
], np.float32)


class IcosahedronEncoding:
    """Callable encoding; stateless (no learned parameters)."""

    def __init__(self, min_deg: int = 0, max_deg: int = 1, scale: float = 0.1):
        self.min_deg = min_deg
        self.max_deg = max_deg
        self.n_freqs = max_deg - min_deg + 1
        self.scale = scale
        self.dirs = jnp.asarray(ICOSAHEDRON_DIRS.T)  # [3, 21]
        self.freqs = jnp.asarray(
            2.0 ** np.linspace(min_deg, max_deg, self.n_freqs), jnp.float32
        )
        self.embedding_size = 2 * 21 * self.n_freqs + 3

    def __call__(self, x: jax.Array) -> jax.Array:
        """x [..., 3] -> [..., embedding_size]."""
        x = x * self.scale
        proj = x @ self.dirs  # [..., 21]
        xb = (proj[..., None] * self.freqs).reshape(proj.shape[:-1] + (-1,))
        emb = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
        return jnp.concatenate([x, emb], axis=-1)


def nerf_encoding(p: jax.Array, L: int = 10) -> jax.Array:
    """Standard NeRF sin/cos encoding
    (`models/PostionalEncoding.py:133-144`)."""
    outs = [p]
    for i in range(L):
        outs.append(jnp.sin((2.0 ** i) * p))
        outs.append(jnp.cos((2.0 ** i) * p))
    return jnp.concatenate(outs, axis=-1)
