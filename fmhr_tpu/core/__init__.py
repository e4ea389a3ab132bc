from .rotations import quat_to_matrix, rodrigues, rigid_transform_chain
from .cameras import (
    decompose_projection,
    load_K_Rt_from_P,
    ndc_projection,
    camera_matrices_from_P,
    get_ray_directions,
    get_rays,
)
from .sh import sh_basis, sh_radiance, eval_sh
from .mesh import MeshTopology, vertex_normals, edge_lengths_sq, laplacian_smoothing
from .subdivision import loop_subdivide, subdivide_weights, loop_subdivide_iter

__all__ = [
    "quat_to_matrix",
    "rodrigues",
    "rigid_transform_chain",
    "decompose_projection",
    "load_K_Rt_from_P",
    "ndc_projection",
    "camera_matrices_from_P",
    "get_ray_directions",
    "get_rays",
    "sh_basis",
    "sh_radiance",
    "eval_sh",
    "MeshTopology",
    "vertex_normals",
    "edge_lengths_sq",
    "laplacian_smoothing",
    "loop_subdivide",
    "subdivide_weights",
    "loop_subdivide_iter",
]
