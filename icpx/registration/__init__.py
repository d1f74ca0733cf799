from icpx.registration.horn import horn_align, umeyama_align
from icpx.registration.icp import ICPConfig, ICPResult, register, register_xyz
from icpx.registration.ndt import ndt_cells, register_ndt
from icpx.registration.pyramid import PyramidConfig, register_pyramid
from icpx.registration.linearize import (
    build_normal_equations_p2plane,
    build_normal_equations_symmetric,
)
from icpx.registration.solve import (
    reconstruct_symmetric_transform,
    solve_damped_6x6,
)

__all__ = [
    "ndt_cells",
    "register_ndt",
    "horn_align",
    "umeyama_align",
    "ICPConfig",
    "ICPResult",
    "register",
    "register_xyz",
    "build_normal_equations_symmetric",
    "build_normal_equations_p2plane",
    "reconstruct_symmetric_transform",
    "solve_damped_6x6",
]
