"""CLI: train the spectral GCN decoder on MANO parameter annotations.

Parity: `python train_gcn.py` (`/root/reference/train_gcn.py:89-194`):
iterate (pose, shape, trans) samples from the InterHand MANO NeuralAnnot
JSON, train with the augmented six-term loss, report root-aligned
MPVPE/MPJPE on the val split, save the checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from os.path import join

from ._common import platform_arg, apply_platform


def load_mano_param_dataset(data_path: str, split: str, hand_type: str):
    """[(pose48, shape10, trans3)] from the NeuralAnnot JSON
    (`train_gcn.py:20-45`)."""
    import numpy as np

    with open(join(data_path, f"annotations/{split}",
                   f"InterHand2.6M_{split}_MANO_NeuralAnnot.json")) as f:
        params = json.load(f)
    out = []
    for cap in params:
        for frame, entry in params[cap].items():
            p = entry.get(hand_type)
            if p is None:
                continue
            out.append((
                np.asarray(p["pose"], np.float32).reshape(-1),
                np.asarray(p["shape"], np.float32).reshape(-1),
                np.asarray(p["trans"], np.float32).reshape(-1),
            ))
    return out


def main(data_path: str, hand_type: str, mano_npz: str,
         batch_size: int = 64, num_epochs: int = 50, lr: float = 1e-3,
         out: str = "mano/gcn_{hand}.pkl", val_every: int = 1) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..body.mano import ManoModel
    from ..nn.gcn import build_gcn_decoder
    from ..optim.gcn_train import (
        make_gcn_train_step, _mano_fwd, get_trans_scale, mpvpe_mpjpe,
    )
    from ..core.rotations import rodrigues

    model = ManoModel.load_npz(mano_npz)
    gcn, H = build_gcn_decoder(model.v_template, model.faces)
    params = gcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)))
    init_opt, step = make_gcn_train_step(gcn.apply, model, model.faces, lr=lr)
    opt_state = init_opt(params)

    train = load_mano_param_dataset(data_path, "train", hand_type)
    val = load_mano_param_dataset(data_path, "val", hand_type)
    print(f"train {len(train)} / val {len(val)} samples")

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    for epoch in range(num_epochs):
        order = rng.permutation(len(train))
        losses = []
        for k in range(0, len(train) - batch_size + 1, batch_size):
            idx = order[k:k + batch_size]
            pose = jnp.asarray(np.stack([train[i][0] for i in idx]))
            shape = jnp.asarray(np.stack([train[i][1] for i in idx]))
            trans = jnp.asarray(np.stack([train[i][2] for i in idx]))
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, pose, shape,
                                           trans, sub)
            losses.append(float(loss))
        msg = f"epoch {epoch}: loss {np.mean(losses):.4f}"

        if val and epoch % val_every == 0:
            mpj, mpv = 0.0, 0.0
            nb = 0
            for k in range(0, len(val) - batch_size + 1, batch_size):
                pose = jnp.asarray(np.stack([v[0] for v in val[k:k+batch_size]]))
                shape = jnp.asarray(np.stack([v[1] for v in val[k:k+batch_size]]))
                trans = jnp.asarray(np.stack([v[2] for v in val[k:k+batch_size]]))
                verts, joints, ori_j = _mano_fwd(model, pose, shape, trans)
                ntrans, nscale = get_trans_scale(joints)
                jn = (joints - ntrans) * nscale
                pred, _, _ = gcn.apply(params, jn.reshape(jn.shape[0], 63))
                pred = pred / nscale + ntrans
                pj = jnp.einsum("bvk,jv->bjk", pred,
                                jnp.asarray(model.J_regressor))
                a, b = mpvpe_mpjpe(pred, verts, pj, ori_j)
                mpj += float(a); mpv += float(b); nb += 1
            msg += f" | val MPJPE {mpj/nb*1000:.2f}mm MPVPE {mpv/nb*1000:.2f}mm"
        print(msg)

    dst = out.format(hand=hand_type)
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    with open(dst, "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print("saved", dst)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--hand_type", default="left", choices=["left", "right"])
    ap.add_argument("--mano_npz", required=True)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--num_epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    main(args.data_path, args.hand_type, args.mano_npz,
         args.batch_size, args.num_epochs, args.lr)
