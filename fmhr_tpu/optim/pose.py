"""3D keypoint triangulation from per-view 2D detections.

TPU-native version of `pose_optim.py:85-121`: the whole 500-epoch Adam
loop jits into ONE `lax.scan` — no per-step host sync, no `.item()`
logging, and no x200 batch replication (replicating identical views only
rescales the summed gradient, which Adam renormalizes away; we keep the
reference's hyperparameters otherwise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _project_uv(points3d, w2cs, projs):
    """points3d [K, 3] -> [N, K, 2] NDC uv via transposed matrices."""
    ones = jnp.ones_like(points3d[:, :1])
    ph = jnp.concatenate([points3d, ones], axis=1)  # [K, 4]
    rot = jnp.einsum("kj,njl->nkl", ph, w2cs)
    proj = jnp.einsum("nkj,njl->nkl", rot, projs)
    return proj[:, :, :2] / proj[:, :, 3:4]


def init_from_first_view(poses2d, w2cs):
    """The reference's quirky init (`pose_optim.py:90-94`): first view's
    2D NDC xy with homogeneous coordinate 0 rotated by c2w (direction-only
    transform — replicated faithfully)."""
    p = jnp.concatenate(
        [poses2d[0, :, :2], jnp.zeros_like(poses2d[0, :, :2])], axis=1
    )  # [K, 4] with w = 0
    c2w = jnp.linalg.inv(w2cs[0])
    return (p @ c2w)[:, :3]


def triangulate_keypoints(
    w2cs,
    projs,
    poses2d,
    weights,
    epochs: int = 500,
    lr: float = 0.005,
    init=None,
):
    """Returns optimized [42, 3] keypoints and the loss trace.

    w2cs/projs: [N, 4, 4] transposed; poses2d: [N, 42, 3] (xy used);
    weights: [N, 42] (0 for undetected hands).
    """
    w2cs = jnp.asarray(w2cs, jnp.float32)
    projs = jnp.asarray(projs, jnp.float32)
    poses2d = jnp.asarray(poses2d, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)[..., None]

    pred = init_from_first_view(poses2d, w2cs) if init is None else jnp.asarray(init)
    opt = optax.adam(lr)

    target = poses2d[:, :, :2] * weights

    def loss_fn(p):
        uv = _project_uv(p, w2cs, projs)
        return jnp.mean(jnp.abs(uv * weights - target))

    @jax.jit
    def run(p0):
        state0 = opt.init(p0)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            upd, s = opt.update(g, s)
            return (optax.apply_updates(p, upd), s), loss

        (p, _), losses = jax.lax.scan(step, (p0, state0), None, length=epochs)
        return p, losses

    return run(pred)
