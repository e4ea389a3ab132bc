"""Shared CLI helpers."""

from __future__ import annotations

import argparse
import os


def platform_arg(ap: argparse.ArgumentParser) -> None:
    ap.add_argument(
        "--platform", default=None,
        help="force a JAX platform (e.g. cpu); default: environment",
    )


def apply_platform(args) -> None:
    if getattr(args, "platform", None):
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)


def out_dirs(data_path: str, *subdirs: str) -> str:
    """Reference convention: '<x>_data' -> '<x>_out' (`pose_optim.py:124`,
    `mesh_sfs_optim.py:34`)."""
    out_path = data_path.rstrip("/").split("/")[-1].replace("data", "out")
    path = os.path.join(out_path, *subdirs)
    os.makedirs(path, exist_ok=True)
    return path
