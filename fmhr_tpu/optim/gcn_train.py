"""GCN decoder training + inference (joints -> MANO-topology mesh).

TPU-native rebuild of `/root/reference/train_gcn.py`:

- `gcn_train_step`: the per-batch loss of `train_gcn.py:108-162` — random
  rotation/scale augmentation, mesh/joint/normal/edge/mano-param/union
  losses — as one jittable step over (pose, shape, trans) parameter
  batches (the MANO-parameter "dataset" is whatever iterator the caller
  supplies; InterHand annotations or synthetic draws).
- `gcn_infer`: normalization -> decoder -> least-squares Rt alignment of
  the re-decoded MANO mesh, with the 100-step rotation refinement
  (`train_gcn.py:196-238`), all jitted.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..body.mano import ManoModel, mano_forward, joints21
from ..core.mesh import vertex_normals, edge_lengths_sq
from ..core.rotations import rodrigues


def _mano_fwd(model: ManoModel, pose, shape, trans):
    """48-d axis-angle forward; returns (verts, joints21, joints16).

    Parity: `train_gcn.py:47-59` (smplx path: use_pca=False, hand mean
    added, pose blend shapes active)."""
    verts, j16 = mano_forward(
        model, pose[:, :3], pose[:, 3:], shape, transl=trans, use_pca=False
    )
    return verts, joints21(model, verts, j16), j16


def get_trans_scale(joints):
    """Normalize: centroid -> 0, |j1 - j0| -> 0.5 (`train_gcn.py:77-86`)."""
    trans = joints.mean(1, keepdims=True)
    scale = 0.5 / jnp.sqrt(
        jnp.sum((joints[:, 1:2] - joints[:, 0:1]) ** 2, 2, keepdims=True)
    )
    return trans, scale


def make_gcn_train_step(gcn_apply, model: ManoModel, faces, lr=1e-3):
    """Returns (init_opt, step) where step consumes (pose, shape, trans)."""
    faces = jnp.asarray(faces, jnp.int32)
    J_reg = jnp.asarray(model.J_regressor)
    opt = optax.adam(lr)

    def loss_fn(params, pose, shape, trans, rng):
        B = pose.shape[0]
        ori_verts, joints, ori_j = _mano_fwd(model, pose, shape, trans)
        k1, k2 = jax.random.split(rng)
        rot = jax.random.normal(k1, (B, 3)) * 4.0 - 4.0
        rot_mat = rodrigues(rot)
        ntrans, nscale = get_trans_scale(joints)
        randscale = 1.2 - jax.random.normal(k2, nscale.shape) * 0.4

        tf = lambda x: jnp.einsum("bij,bkj->bki", rot_mat, x - ntrans) * nscale * randscale
        joints_a = tf(joints)
        verts_a = tf(ori_verts)
        ori_j_a = tf(ori_j)
        normals_a = vertex_normals(verts_a, faces)
        edge_a = edge_lengths_sq(verts_a, faces)

        pred_verts, preds_mano, _ = gcn_apply(params, joints_a.reshape(B, 63))
        pred_joints = jnp.einsum("bvk,jv->bjk", pred_verts, J_reg)

        mesh_loss = 2.0 * jnp.mean(jnp.abs(pred_verts - verts_a))
        joints_loss = 2.0 * jnp.mean(jnp.abs(pred_joints - ori_j_a))
        normal_loss = jnp.mean(
            jnp.abs(vertex_normals(pred_verts, faces) - normals_a)
        )
        edge_loss = 5.0 * jnp.mean(
            jnp.abs(edge_lengths_sq(pred_verts, faces) - edge_a)
        )
        mano_params_gt = jnp.concatenate([pose[:, 3:], shape], 1)  # 45+10
        mano_loss = jnp.mean(jnp.abs(mano_params_gt - preds_mano))
        p_verts, _, _ = _mano_fwd(
            model,
            jnp.concatenate([pose[:, :3], preds_mano[:, :-10]], 1),
            preds_mano[:, -10:],
            trans,
        )
        union_loss = 2.0 * jnp.mean(jnp.abs(p_verts - ori_verts))
        return (mesh_loss + joints_loss + normal_loss + edge_loss
                + mano_loss + union_loss)

    @jax.jit
    def step(params, opt_state, pose, shape, trans, rng):
        loss, g = jax.value_and_grad(loss_fn)(params, pose, shape, trans, rng)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    return opt.init, step


def mpvpe_mpjpe(pred_verts, gt_verts, pred_joints, gt_joints):
    """Root-aligned mean per-vertex / per-joint position error
    (`train_gcn.py:61-75`), in the input units."""
    pa = pred_verts - pred_joints[:, :1]
    ga = gt_verts - gt_joints[:, :1]
    pj = pred_joints - pred_joints[:, :1]
    gj = gt_joints - gt_joints[:, :1]
    mpvpe = jnp.mean(jnp.sqrt(jnp.sum((pa - ga) ** 2, -1)))
    mpjpe = jnp.mean(jnp.sqrt(jnp.sum((pj - gj) ** 2, -1)))
    return mpjpe, mpvpe


def gcn_infer(gcn_apply, params, model: ManoModel, joints, refine_steps=100):
    """joints [B, 21, 3] world -> (verts, mano_verts_aligned, mano_params,
    Rt [B, 4, 4], mids). Parity: `train_gcn.py:196-238`."""
    B = joints.shape[0]
    ntrans, nscale = get_trans_scale(joints)
    jn = (joints - ntrans) * nscale
    verts, mano, mid = gcn_apply(params, jn.reshape(B, 63))
    verts = verts / nscale + ntrans
    mid = [m / nscale + ntrans for m in mid]

    j_from_verts = jnp.einsum("bvk,jv->bjk", verts, jnp.asarray(model.J_regressor))
    mano_vertices, mano_joints = mano_forward(
        model, jnp.zeros((B, 3)), mano[:, :-10], mano[:, -10:], use_pca=False
    )
    scale = jnp.sqrt(
        jnp.sum((j_from_verts[:, 1:2] - j_from_verts[:, 0:1]) ** 2, 2, keepdims=True)
    ) / jnp.sqrt(
        jnp.sum((mano_joints[:, 1:2] - mano_joints[:, 0:1]) ** 2, 2, keepdims=True)
    )

    ones = jnp.ones((B, mano_vertices.shape[1], 1))
    A = jnp.concatenate([mano_vertices, ones], 2)
    Bm = jnp.concatenate([verts, jnp.ones((B, verts.shape[1], 1))], 2)
    At = jnp.swapaxes(A, 1, 2)
    Rt = jnp.linalg.solve(At @ A, At @ Bm)  # [B, 4, 4] row-vector transform

    # rotation refinement: fit rodrigues(rot) * scale to Rt[:, :3, :3]
    R_target = jax.lax.stop_gradient(Rt[:, :3, :3])
    rot0 = jax.vmap(jnp.diag)(R_target)  # diag init (`train_gcn.py:223`)
    opt = optax.adam(1.0)

    def refine(rot0):
        state = opt.init(rot0)

        def body(carry, _):
            rot, s = carry
            loss, g = jax.value_and_grad(
                lambda r: jnp.mean(jnp.abs(rodrigues(r) * scale - R_target))
            )(rot)
            upd, s = opt.update(g, s)
            return (optax.apply_updates(rot, upd), s), loss

        (rot, _), _ = jax.lax.scan(body, (rot0, state), None, length=refine_steps)
        return rot

    rot = refine(rot0)
    Rt = Rt.at[:, :3, :3].set(rodrigues(rot) * scale)
    mano_aligned = (A @ Rt)[:, :, :3]
    return verts, mano_aligned, mano, Rt, mid
