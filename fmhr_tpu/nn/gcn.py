"""Spectral GCN decoder (CoMA-style Chebyshev convolutions).

TPU-native rebuild of `/root/reference/models/gcn.py`: 63-d joint input ->
latent -> coarse mesh -> 4 upsampling residual decoder blocks -> full-res
MANO-topology mesh + 55 MANO parameters. All graph operators (Chebyshev
recurrence, pool/unpool) are DENSE [V, V] matmuls — MANO templates are
<=778 vertices, so dense lands on the MXU and avoids torch.sparse
entirely (`models/gcn.py:15-20,64-82`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as fnn

from .mesh_sampling import generate_transform_matrices


class ChebConv(fnn.Module):
    """Chebyshev graph convolution, order k (`models/gcn.py:47-82`)."""

    fout: int
    k: int = 1
    use_bias: bool = False

    @fnn.compact
    def __call__(self, x, L):
        # x: [B, V, Fin]; L: [V, V]
        xs = [x]
        if self.k > 1:
            xs.append(jnp.einsum("uv,bvf->buf", L, x))
        for _ in range(2, self.k):
            xs.append(2.0 * jnp.einsum("uv,bvf->buf", L, xs[-1]) - xs[-2])
        xk = jnp.concatenate(xs, axis=-1)  # [B, V, Fin*k]
        w = self.param(
            "w",
            fnn.initializers.kaiming_uniform(),
            (xk.shape[-1], self.fout),
        )
        y = xk @ w
        if self.use_bias:
            y = y + self.param("b", fnn.initializers.zeros, (1, 1, self.fout))
        return y


class ComaGroupNorm(fnn.Module):
    """GroupNorm over (channel-group, vertices) (`models/gcn.py:23-44`)."""

    channels: int
    groups: int = 32
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x):
        # x: [B, V, C]
        B, V, C = x.shape
        G = min(self.groups, C)
        gamma = self.param("gamma", fnn.initializers.ones, (1, 1, C))
        beta = self.param("beta", fnn.initializers.zeros, (1, 1, C))
        xg = x.transpose(0, 2, 1).reshape(B, G, C // G, V)
        mean = xg.mean(axis=(2, 3), keepdims=True)
        var = xg.var(axis=(2, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        xn = xg.reshape(B, C, V).transpose(0, 2, 1)
        return xn * gamma + beta


def pool(x, M):
    """x [B, V, F], M [V', V] -> [B, V', F] (`models/gcn.py:15-20`)."""
    return jnp.einsum("uv,bvf->buf", M, x)


class ComaResBlockDecoder(fnn.Module):
    """Unpool + GN/ReLU bottleneck residual block (`models/gcn.py:114-145`)."""

    fin: int
    fout: int
    k: int

    @fnn.compact
    def __call__(self, x, L, U):
        x_up = pool(x, U)
        h = fnn.relu(ComaGroupNorm(self.fin)(x_up))
        h = ChebConv(self.fout // 2, 1)(h, L)
        h = fnn.relu(ComaGroupNorm(self.fout // 2)(h))
        h = ChebConv(self.fout // 2, self.k)(h, L)
        h = fnn.relu(ComaGroupNorm(self.fout // 2)(h))
        h = ChebConv(self.fout, 1)(h, L)
        if self.fin != self.fout:
            x_up = ChebConv(self.fout, 1)(x_up, L)
        return h + x_up


class GCNDecoder(fnn.Module):
    """Mirror of `models/gcn.py:185-262` with static dense hierarchy.

    Construct via `GCNDecoder.from_template(verts, faces)` helpers below;
    hierarchy matrices are captured as numpy constants in the module.
    """

    levels_L: tuple          # coarsest..finest usage order handled in call
    levels_U: tuple
    p: tuple                 # vertex counts per level [fine..coarse]
    num_input: int = 63
    num_latent: int = 64
    num_1x1: int = 128
    nf: int = 64
    mano_param_num: int = 55

    @fnn.compact
    def __call__(self, latent):
        # latent: [B, num_input]
        B = latent.shape[0]
        num = len(self.levels_U)  # 4
        Ls = [jnp.asarray(l) for l in self.levels_L]
        Us = [jnp.asarray(u) for u in self.levels_U]

        x_tmp = fnn.Dense(self.num_latent)(latent)
        x_tmp = fnn.Dense(self.p[-1] * self.num_latent)(x_tmp)
        x_tmp = fnn.leaky_relu(x_tmp, 0.2)

        x = x_tmp.reshape(B, self.p[-1], self.num_latent)
        x = ChebConv(self.num_1x1, 1)(x, Ls[num - 1])

        mean = self.param("mean", fnn.initializers.zeros, (1, self.p[0], 3))
        std = self.param(
            "std", lambda k, s: jnp.ones(s) * 0.02, (1, self.p[0], 3)
        )
        conv3 = ChebConv(3, 2, name="conv3")

        tmp = []
        for i in range(num):
            lvl = (-i - 1) % num
            x = ComaResBlockDecoder(
                self.num_1x1 if i == 0 else self.nf, self.nf, 2
            )(x, Ls[lvl], Us[lvl])
            tmp.append(conv3(x, Ls[lvl]) * std.mean() + mean.mean())

        mano_x = jnp.concatenate([x_tmp, tmp[0].reshape(B, -1)], axis=1)
        h = fnn.Dense(256)(mano_x)
        h = fnn.Dense(128)(h)
        h = fnn.Dense(64)(h)
        mano_params = fnn.Dense(self.mano_param_num)(h)

        x_hat = conv3(x, Ls[0]) * std + mean
        return x_hat, mano_params, tmp


def build_gcn_decoder(template_verts, template_faces, num_input=63,
                      ds_factors=(1, 2, 2, 2), **kw):
    """Build hierarchy + decoder module for a template mesh (role of
    `GCNDecoder.__init__` at `models/gcn.py:186-244`)."""
    H = generate_transform_matrices(template_verts, template_faces, ds_factors)
    # levels: index 0 = finest. L list per reference: laplacian of A[i].
    Ls = tuple(np.asarray(l, np.float32) for l in H["L"][:4])
    Us = tuple(np.asarray(u, np.float32) for u in H["U"])
    p = tuple(int(a.shape[0]) for a in H["A"])
    model = GCNDecoder(levels_L=Ls, levels_U=Us, p=p, num_input=num_input, **kw)
    return model, H
