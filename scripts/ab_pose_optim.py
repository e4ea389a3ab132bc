"""Whole-stage A/B: run the REFERENCE's pose_optim.py (torch, CPU) and
this repo's triangulation on the same demo capture, compare outputs.

VERDICT r4 next-round #4: the first cross-implementation check that runs
the actual reference code (`/root/reference/pose_optim.py:85-134`) end to
end, not a re-derivation of its math. The reference script is pure
torch + numpy + cv2; its `.cuda()` calls are neutralized so it runs on
the CPU torch in this environment. No reference code is copied — the
module is imported from /root/reference and executed as-is.

Usage: python scripts/ab_pose_optim.py [--epochs 500]
Prints a parity table; exits nonzero on mismatch beyond tolerance.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")


class _RecordingBar:
    """Stands in for tqdm inside the reference module: iterates and
    records the loss printed into set_description."""

    def __init__(self, it):
        self.it = it
        self.losses: list[float] = []

    def __iter__(self):
        return iter(self.it)

    def set_description(self, desc):
        # reference format: 'loss:%.4f'
        self.losses.append(float(desc.split(":")[1]))


def run_reference(data_path: str, scan_id: int, epochs: int, batch: int):
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU environment
    torch.manual_seed(0)
    sys.path.insert(0, REF)
    import pose_optim as ref  # noqa: E402  (executed, never copied)

    bars: list[_RecordingBar] = []

    def rec_tqdm(it):
        bar = _RecordingBar(it)
        bars.append(bar)
        return bar

    ref.tqdm = rec_tqdm
    t0 = time.time()
    w2cs, projs, poses, Pall, weights = ref.get_data(data_path, scan_id, 16)
    pred = ref.pose_optimize(batch, epochs, w2cs, projs, poses, weights)
    dt = time.time() - t0
    inputs = (w2cs.cpu().numpy(), projs.cpu().numpy(),
              poses.cpu().numpy(), weights.cpu().numpy())
    return np.asarray(pred.cpu()), np.asarray(bars[-1].losses), dt, inputs


def run_ours(inputs, epochs: int):
    from fmhr_tpu.optim.pose import triangulate_keypoints

    w2cs, projs, poses, weights = inputs
    t0 = time.time()
    pred, losses = triangulate_keypoints(
        w2cs, projs, poses, weights, epochs=epochs)
    pred = np.asarray(pred)
    return pred, np.asarray(losses), time.time() - t0


def run_ours_loader(data_path: str, scan_id: int):
    """Loader parity: our demo loader vs the reference's get_data."""
    from fmhr_tpu.data import load_demo_views, load_demo_keypoints2d

    views = load_demo_views(data_path, scan_id, num=16, with_mask=False)
    poses2d, weights = load_demo_keypoints2d(data_path, scan_id, num=16)
    return (np.asarray(views.w2cs), np.asarray(views.projs),
            np.asarray(poses2d), np.asarray(weights))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch", type=int, default=200,
                    help="reference's view-replication factor")
    ap.add_argument("--data_path", default=os.path.join(REF, "demo_data"))
    ap.add_argument("--scan_id", type=int, default=1)
    args = ap.parse_args()

    ref_pred, ref_losses, ref_dt, ref_inputs = run_reference(
        args.data_path, args.scan_id, args.epochs, args.batch)
    our_pred, our_losses, our_dt = run_ours(ref_inputs, args.epochs)

    # loader parity (independent of the optimizer)
    ours_in = run_ours_loader(args.data_path, args.scan_id)
    loader_err = [float(np.abs(a - b).max())
                  for a, b in zip(ref_inputs, ours_in)]

    span = float(ref_pred.max() - ref_pred.min())
    kp_max = float(np.abs(ref_pred - our_pred).max())
    kp_rms = float(np.sqrt(((ref_pred - our_pred) ** 2).mean()))
    n = min(len(ref_losses), len(our_losses))
    # reference records loss BEFORE the step at each epoch; ours likewise
    loss_max = float(np.abs(ref_losses[:n] - np.asarray(our_losses[:n])).max())

    print(f"reference pose_optim.py ran HERE (torch CPU, batch="
          f"{args.batch}): {ref_dt:.1f}s for {args.epochs} epochs")
    print(f"ours (jax CPU, one lax.scan):                    {our_dt:.1f}s")
    print(f"loader max|delta| (w2cs, projs, poses2d, weights): "
          f"{['%.2e' % e for e in loader_err]}")
    print(f"final loss  ref {ref_losses[-1]:.6f}  ours "
          f"{float(our_losses[-1]):.6f}")
    print(f"loss-curve max|delta| over {n} epochs: {loss_max:.2e}")
    print(f"final keypoints: max|delta| {kp_max:.2e}  rms {kp_rms:.2e} "
          f"(coordinate span {span:.3f})")

    ok = (kp_max < 5e-3 * span and loss_max < 5e-4
          and all(e < 1e-5 for e in loader_err))
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
