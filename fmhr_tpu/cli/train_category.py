"""CLI: category-level neural-renderer training over InterHand features.

Parity: `python train_mlp.py` / `train_unet.py` (`README` of the
reference; `train_mlp.py:207-283`): stream (image, rays, cameras,
mesh+albedo+features) samples across ALL captures and train one renderer
+ one shared vertex-feature table; checkpoint every 5 epochs
(`train_mlp.py:282-283`).
"""

from __future__ import annotations

import argparse
import os
import pickle

from ._common import platform_arg, apply_platform


def main(data_path: str, conf_path: str | None = None, batch: int = 16,
         num_epochs: int = 51, ckpt_dir: str = "checkpoints",
         drop_cam=(), res=(334, 512)) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..optim.neural_dataset import (
        FeatureDataset, prefetch_batches, make_category_train_step,
    )
    from ..utils.config import load_config

    if conf_path:
        conf = load_config(conf_path)
        res = (conf.get_int("w"), conf.get_int("h"))
        drop_cam = tuple(conf.get_list("drop_cam", default=""))
        data_path = conf.get_string("data_path", data_path)

    ds = FeatureDataset(data_path, split="train", drop_cam=drop_cam, res=res)
    print(f"dataset: {len(ds)} samples")
    init, step, _ = make_category_train_step((res[1], res[0]))
    params, opt_state = init(jax.random.PRNGKey(0))
    os.makedirs(ckpt_dir, exist_ok=True)

    key = jax.random.PRNGKey(1)
    seen = 0
    epoch = 0
    steps_per_epoch = max(1, len(ds) // batch)
    for b in prefetch_batches(ds, batch, num_epochs):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, jb, sub)
        seen += 1
        if seen % 50 == 0:
            print(f"step {seen}: loss {float(loss):.5f}")
        if seen % steps_per_epoch == 0:
            epoch += 1
            if epoch % 5 == 0:
                with open(os.path.join(ckpt_dir, f"mlp_{epoch}.pkl"), "wb") as f:
                    pickle.dump(jax.device_get(params), f)
                print(f"checkpointed epoch {epoch}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--conf", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_epoch", type=int, default=51)
    ap.add_argument("--ckpt_dir", default="checkpoints")
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    main(args.data_path, args.conf, args.batch, args.num_epoch, args.ckpt_dir)
