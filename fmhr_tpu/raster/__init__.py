"""Differentiable triangle rasterizer — TPU-native two-phase design.

This package replaces nvdiffrast (the reference's only image-formation
path: `rasterize` -> `interpolate` -> `antialias`,
`/root/reference/mesh_sfs_optim.py:142-147` et al.) with an architecture
shaped for XLA/TPU rather than a CUDA port:

1. **Visibility phase** (`visibility.py`): compute the per-pixel covering
   triangle id (argmin depth). Integer output, *not* differentiated —
   ids are piecewise-constant in vertex positions, so stopping gradients
   here is exact, not an approximation. Implementations: brute-force
   chunked scan (reference/testing), tile-binned (production), Pallas
   kernel (hot path).
2. **Attribute phase** (`geometry.py` + `api.py`): re-derive
   perspective-correct barycentrics analytically per pixel from the
   gathered clip-space vertices. Pure dense gather + elementwise math that
   XLA fuses; JAX autodiff through it reproduces nvdiffrast's
   rasterize/interpolate vertex gradients (the "deferred shading /
   visibility buffer" trick).
3. **Antialias phase** (`antialias.py`): analytic silhouette-edge blending
   between adjacent pixel pairs, giving the occlusion-boundary gradients
   w.r.t. vertex positions that interior barycentrics cannot provide.

Output conventions match nvdiffrast as used by the reference:
`rast[..., :2]` = (u, v) perspective-correct barycentrics s.t.
attr = u·a0 + v·a1 + (1−u−v)·a2; `rast[..., 2]` = z/w (screen-linear);
`rast[..., 3]` = triangle_id + 1 (0 = background); pixel row 0 = NDC y=-1.
"""

from .api import (rasterize, interpolate, rasterize_ids,
                  rasterize_with_context, render_pixels, render_scene)
from .antialias import antialias, antialias_weights, apply_antialias, AATopology

__all__ = ["rasterize", "interpolate", "rasterize_ids",
           "rasterize_with_context", "render_pixels", "render_scene", "antialias",
           "antialias_weights", "apply_antialias", "AATopology"]
