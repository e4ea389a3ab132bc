"""Shared rasterization geometry: screen mapping and barycentrics.

All functions are pure jnp, differentiable, and broadcast over leading
dims. Clip-space convention follows the reference projection
(`/root/reference/get_data.py:66-73`): x, y in [-w, w], z = const(-0.1),
w = view-space depth (>0 in front of the camera).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Minimum view depth: triangles with any vertex closer than this are
# rejected whole (the reference scenes keep hands ~0.3+ units from every
# camera, so true near-plane clipping never engages; nvdiffrast would clip).
W_EPS = 1e-6
# Degenerate-triangle area guard in NDC units².
AREA_EPS = 1e-12


def pixel_ndc(height: int, width: int, dtype=jnp.float32):
    """NDC coordinates of pixel centers. Returns (px [W], py [H]).

    Row 0 = NDC y -1 (image top, since the projection maps camera +y down
    to +NDC y and cv2 images are stored top-down)."""
    px = (jnp.arange(width, dtype=dtype) + 0.5) * (2.0 / width) - 1.0
    py = (jnp.arange(height, dtype=dtype) + 0.5) * (2.0 / height) - 1.0
    return px, py


def screen_xy(clip: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """clip [..., 4] -> (sx, sy, w) NDC screen coords with safe divide."""
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    return clip[..., 0] / safe_w, clip[..., 1] / safe_w, w


def tri_screen_barycentrics(sx, sy, px, py):
    """Screen-space barycentrics of pixel (px, py) w.r.t. triangle.

    sx, sy: [..., 3] screen vertex coords; px, py broadcastable to [...].
    Returns (lam [..., 3], twice_area [...]) — lam sums to 1 when the
    triangle is non-degenerate; sign(area)·lam_i >= 0 inside.
    """
    x0, x1, x2 = sx[..., 0], sx[..., 1], sx[..., 2]
    y0, y1, y2 = sy[..., 0], sy[..., 1], sy[..., 2]
    d = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    l0 = (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)
    l1 = (x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)
    l2 = (x0 - px) * (y1 - py) - (x1 - px) * (y0 - py)
    safe_d = jnp.where(jnp.abs(d) > AREA_EPS, d, AREA_EPS)
    lam = jnp.stack([l0, l1, l2], axis=-1) / safe_d[..., None]
    return lam, d


def perspective_correct(lam: jax.Array, w: jax.Array) -> jax.Array:
    """Screen barycentrics -> perspective-correct barycentrics.

    lam, w: [..., 3]. Returns [..., 3] summing to 1.
    """
    safe_w = jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    lw = lam / safe_w
    denom = jnp.sum(lw, axis=-1, keepdims=True)
    denom = jnp.where(jnp.abs(denom) > W_EPS, denom, W_EPS)
    return lw / denom


def tri_depth_zw(lam: jax.Array, clip_tri: jax.Array) -> jax.Array:
    """Screen-linear interpolated z/w (the OpenGL depth-buffer value).

    lam: [..., 3] screen barycentrics; clip_tri: [..., 3, 4].
    """
    w = clip_tri[..., 3]
    safe_w = jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    zw = clip_tri[..., 2] / safe_w
    return jnp.sum(lam * zw, axis=-1)


def coverage(lam: jax.Array, d: jax.Array, w: jax.Array) -> jax.Array:
    """Boolean inside-test: all barycentrics on the area's side, all
    vertices in front of the camera (no near clipping — see W_EPS note)."""
    inside = jnp.all(lam >= 0.0, axis=-1) & (jnp.abs(d) > AREA_EPS)
    in_front = jnp.all(w > W_EPS, axis=-1)
    return inside & in_front
