"""Patch-based normalized cross-correlation (multi-view photoconsistency).

Parity: `/root/reference/models/ncc_utils.py:4-35` (NCC). Vestigial in the
reference release (no live call site, SURVEY §1) but part of the public
surface; kept for completeness with identical semantics including the
zero-variance guard (variance 0 -> add 1 before sqrt).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ncc(ref, src, src_valid_mask):
    """ref: [1, P, K]; src: [N, P, K]; src_valid_mask: [N, P, K].

    Returns [N, P] per-patch NCC between the reference patch and each
    source view's patch, statistics over valid pixels only.
    """
    n = jnp.sum(src_valid_mask, axis=2, keepdims=True)
    n = jnp.where(n == 0, 1.0, n)

    refe = jnp.broadcast_to(ref, src.shape)
    ref_mean = jnp.sum(refe * src_valid_mask, 2, keepdims=True) / n
    ref_var = jnp.sum(((refe - ref_mean) * src_valid_mask) ** 2, 2, keepdims=True) / n
    ref_var = jnp.where(ref_var == 0, 1.0 + ref_var, ref_var)

    src_mean = jnp.sum(src * src_valid_mask, 2, keepdims=True) / n
    src_var = jnp.sum(((src - src_mean) * src_valid_mask) ** 2, 2, keepdims=True) / n
    src_var = jnp.where(src_var == 0, 1.0 + src_var, src_var)

    cov = jnp.sum((refe - ref_mean) * (src - src_mean) * src_valid_mask, 2,
                  keepdims=True) / n
    out = cov / (jnp.sqrt(ref_var) * jnp.sqrt(src_var))
    return out[..., 0]


def build_patch_offsets(h_patch_size: int):
    """[(2h+1)², 2] integer pixel offsets (`ncc_utils.py:84-86`)."""
    r = jnp.arange(-h_patch_size, h_patch_size + 1)
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
