"""Surface-reconstruction extras: Shape-As-Points (DPSR) and classic
shape-from-shading. Rebuilds of `/root/reference/models/sap.py` and
`/root/reference/models/sfs_utils.py` (both vestigial in the reference
release; carried for full component parity)."""

from .sap import (  # noqa: F401
    DPSR, point_rasterize, grid_interp, psr_to_mesh, sap_transform,
    sap_generate, gen_inputs, sample_surface, fftfreqs,
    spec_gaussian_filter,
)
from .marching import marching_tets  # noqa: F401
from .sfs import (  # noqa: F401
    depth2normal, convmtx2, estimate_shading,
    estimate_albedo_and_specularities, refine_surface,
)
