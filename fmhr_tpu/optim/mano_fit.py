"""MANO pose/shape fitting to 3D keypoints (two hands jointly).

TPU-native version of `mano_optim.py:148-293`: 250 Adam epochs over 8
parameter tensors with per-group learning rates, jitted into one
`lax.scan`. Loss parity (`mano_optim.py:267`):
    40 * MSE(joints21_both, k3d) + 0.1 * L1(shape_left, shape_right)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..body.mano import ManoModel, mano_forward, joints21

NCOMPS = 6  # PCA pose components (`mano_optim.py:146`)

# Initial wrist offset subtracted from the first keypoint
# (`mano_optim.py:151`).
_TRANS_OFFSET = np.array([-0.0680, 0.0061, 0.0052], np.float32)


@dataclasses.dataclass
class HandFit:
    pose: np.ndarray    # [1, 48] global orient + full 45-d hand pose (no mean)
    shape: np.ndarray   # [1, 10]
    trans: np.ndarray   # [1, 3]
    scale: np.ndarray   # [1]
    hand_type: str

    def as_mano_out(self) -> dict:
        """The `{type, pose, shape, trans, scale}` dict downstream stages
        consume (`mano_optim.py:341-349`)."""
        return {
            "type": self.hand_type,
            "pose": self.pose.reshape(-1),
            "shape": self.shape.reshape(1, -1),
            "trans": self.trans.reshape(1, -1),
            "scale": float(self.scale.reshape(-1)[0]),
        }


def _forward_hand(model: ManoModel, params):
    """params: dict(pose [1, 3+NCOMPS], shape, trans, scale)."""
    verts, j16 = mano_forward(
        model,
        params["pose"][:, :3],
        params["pose"][:, 3:],
        params["shape"],
        use_pca=True,
    )
    j21 = joints21(model, verts, j16)
    j21 = j21 * params["scale"] + params["trans"][:, None]
    verts = verts * params["scale"] + params["trans"][:, None]
    return verts, j21


def fit_mano_two_hands(
    model_left: ManoModel,
    model_right: ManoModel,
    k3d,
    epochs: int = 250,
    lr_pose: float = 0.05,
    lr_other: float = 0.01,
):
    """k3d: [1, 42, 3] (21 left then 21 right). Returns
    (HandFit left, HandFit right, verts_left [1,V,3], verts_right)."""
    k3d = jnp.asarray(k3d, jnp.float32)

    def init_params(model, k):
        # Data-driven similarity init, generalizing the reference's MANO
        # constants (`mano_optim.py:148-157`: scale = 2.0 and a hardcoded
        # MANO rest-wrist offset — correct only when the model IS MANO).
        # Matching the mean joint-from-wrist extent and wrist position
        # gives the same ballpark for real MANO (~1.5-2.0 on the demo
        # keypoints) and a sane start for stand-in models of any size —
        # the hardcoded 2.0 left the synthetic stand-in ~5x too large
        # after 250 epochs, which wrecked every downstream HAM stage
        # (100 px faces -> pathological tile binning).
        v0, j16 = mano_forward(
            model, jnp.zeros((1, 3)), jnp.zeros((1, NCOMPS)),
            jnp.zeros((1, 10)), use_pca=True)
        j21 = joints21(model, v0, j16)                  # [1, 21, 3]
        span_k = jnp.mean(
            jnp.linalg.norm(k - k[:, :1], axis=-1), axis=-1)
        span_m = jnp.mean(
            jnp.linalg.norm(j21 - j21[:, :1], axis=-1), axis=-1)
        scale0 = span_k / jnp.maximum(span_m, 1e-6)     # [1]
        trans0 = k[:, 0] - scale0[:, None] * j21[:, 0]
        return {
            "pose": jnp.zeros((1, 3 + NCOMPS)),
            "shape": jnp.zeros((1, 10)),
            "trans": trans0,
            "scale": scale0,
        }

    params = {"left": init_params(model_left, k3d[:, :21]),
              "right": init_params(model_right, k3d[:, 21:])}

    labels = {
        h: {"pose": "pose", "shape": "other", "trans": "other", "scale": "other"}
        for h in ("left", "right")
    }
    opt = optax.multi_transform(
        {"pose": optax.adam(lr_pose), "other": optax.adam(lr_other)}, labels
    )

    def loss_fn(p):
        _, jl = _forward_hand(model_left, p["left"])
        _, jr = _forward_hand(model_right, p["right"])
        joints = jnp.concatenate([jl, jr], axis=1)
        mse = jnp.mean((joints - k3d) ** 2)
        shape_reg = jnp.mean(jnp.abs(p["left"]["shape"] - p["right"]["shape"]))
        return 40.0 * mse + 0.1 * shape_reg

    @jax.jit
    def run(p0):
        s0 = opt.init(p0)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            upd, s = opt.update(g, s)
            return (optax.apply_updates(p, upd), s), loss

        (p, _), losses = jax.lax.scan(step, (p0, s0), None, length=epochs)
        return p, losses

    params, losses = run(params)

    out = []
    for hand, model in (("left", model_left), ("right", model_right)):
        p = jax.device_get(params[hand])
        full_hand_pose = p["pose"][:, 3:] @ np.asarray(
            model.hand_components[:NCOMPS]
        )
        out.append(
            HandFit(
                pose=np.concatenate([p["pose"][:, :3], full_hand_pose], 1),
                shape=p["shape"],
                trans=p["trans"],
                scale=p["scale"],
                hand_type=hand,
            )
        )
    vl, _ = _forward_hand(model_left, params["left"])
    vr, _ = _forward_hand(model_right, params["right"])
    return out[0], out[1], np.asarray(vl), np.asarray(vr), np.asarray(losses)
