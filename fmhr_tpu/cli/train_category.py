"""CLI: category-level neural-renderer training over InterHand features.

Parity: `python train_mlp.py` / `train_unet.py` (`README` of the
reference; `train_mlp.py:207-283`, `train_unet.py:200-257`): stream
(image, rays, cameras, mesh+albedo+features) samples across ALL captures
and train one renderer + one shared vertex-feature table; checkpoint
every 5 epochs (`train_mlp.py:282-283`); `--continue_train` resumes from
the latest checkpoint (`train_mlp.py:226-229`); `--eval` renders random
samples with the frozen net and reports masked PSNR + SSIM
(`train_mlp.py:286-320`, `train_unet.py:259-310`).
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle

from ._common import platform_arg, apply_platform


def _latest_ckpt(ckpt_dir: str, net_type: str) -> str | None:
    paths = glob.glob(os.path.join(ckpt_dir, f"{net_type}_*.pkl"))
    if not paths:
        return None
    return max(paths, key=lambda p: int(
        os.path.basename(p).split("_")[-1].split(".")[0]))


def main(data_path: str, conf_path: str | None = None, batch: int = 16,
         num_epochs: int = 51, ckpt_dir: str = "checkpoints",
         drop_cam=(), res=(334, 512), net_type: str = "mlp",
         continue_train: bool = False, eval_only: bool = False,
         eval_samples: int = 10):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..optim.neural_dataset import (
        FeatureDataset, prefetch_batches, make_category_train_step,
        category_eval,
    )
    from ..utils.config import load_config

    if conf_path:
        conf = load_config(conf_path)
        res = (conf.get_int("w"), conf.get_int("h"))
        drop_cam = tuple(conf.get_list("drop_cam", default=""))
        data_path = conf.get_string("data_path", data_path)

    ds = FeatureDataset(data_path, split="train", drop_cam=drop_cam, res=res)
    print(f"dataset: {len(ds)} samples")
    resolution = (res[1], res[0])
    init, step, _ = make_category_train_step(resolution, net_type=net_type)
    params, opt_state = init(jax.random.PRNGKey(0))
    os.makedirs(ckpt_dir, exist_ok=True)

    latest = _latest_ckpt(ckpt_dir, net_type)
    if (continue_train or eval_only) and latest:
        with open(latest, "rb") as f:
            params = jax.device_put(pickle.load(f))
        print(f"loaded checkpoint {latest}")

    if eval_only:
        metrics = category_eval(
            ds, params, resolution, net_type=net_type,
            n_samples=eval_samples, out_dir=f"eval_{net_type}")
        print(f"eval ave: PSNR {metrics['psnr']:.3f} dB | "
              f"SSIM {metrics['ssim']:.4f}")
        return metrics

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
                path = os.path.join(ckpt_dir, f"{net_type}_{epoch}.pkl")
                with open(path, "wb") as f:
                    pickle.dump(jax.device_get(params), f)
                print(f"checkpointed epoch {epoch}")
    return params


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--conf", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_epoch", type=int, default=51)
    ap.add_argument("--ckpt_dir", default="checkpoints")
    ap.add_argument("--net_type", default="mlp", choices=["mlp", "unet"])
    ap.add_argument("--continue_train", action="store_true")
    ap.add_argument("--eval", action="store_true", dest="eval_only")
    ap.add_argument("--eval_samples", type=int, default=10)
    platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)
    main(args.data_path, args.conf, args.batch, args.num_epoch,
         args.ckpt_dir, net_type=args.net_type,
         continue_train=args.continue_train, eval_only=args.eval_only,
         eval_samples=args.eval_samples)
