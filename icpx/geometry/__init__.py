from icpx.geometry.se3 import SE3
from icpx.geometry.transforms import (
    apply_transform,
    rotate_vectors,
    transform_cloud,
    make_rigid_perturbation,
)

__all__ = [
    "SE3",
    "apply_transform",
    "rotate_vectors",
    "transform_cloud",
    "make_rigid_perturbation",
]
