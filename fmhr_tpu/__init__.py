"""fmhr_tpu — TPU-native multi-view hand inverse-rendering framework.

A from-scratch JAX / Pallas / pjit implementation of the capabilities of the
FMHR reference (multi-view hand reconstruction by inverse rendering,
AAAI 2024): differentiable mesh rasterization, MANO body modelling, 3D
keypoint triangulation, MANO pose/shape fitting, HAM mesh+albedo
shape-from-shading optimization with spherical-harmonic lighting, and a
mesh-based neural renderer with LBS re-posing.

Layering (bottom to top), see SURVEY.md §7:

- :mod:`fmhr_tpu.core`    — cameras, rotations, SH shading, mesh topology,
  Loop subdivision (host-side precompute + on-device math).
- :mod:`fmhr_tpu.raster`  — the differentiable rasterizer (visibility kernel +
  differentiable barycentric/interpolation/antialias passes).
- :mod:`fmhr_tpu.body`    — MANO/LBS layer and model-asset conversion.
- :mod:`fmhr_tpu.data`    — demo / InterHand2.6M loaders.
- :mod:`fmhr_tpu.nn`      — renderer heads (MLP/UNet), positional encoding,
  spectral GCN decoder.
- :mod:`fmhr_tpu.optim`   — the five optimization workloads as jitted loops.
- :mod:`fmhr_tpu.dist`    — device-mesh sharding of views/tiles, collectives.
- :mod:`fmhr_tpu.utils`   — config, OBJ IO, metrics, checkpointing.
"""

__version__ = "0.1.0"
