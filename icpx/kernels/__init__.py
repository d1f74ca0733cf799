from icpx.kernels.knn import knn, nearest_neighbor, pairwise_sqdist
from icpx.kernels.normals import estimate_normals
from icpx.kernels.eigh3 import eigh3x3, smallest_eigenvector_3x3

__all__ = [
    "knn",
    "nearest_neighbor",
    "pairwise_sqdist",
    "estimate_normals",
    "eigh3x3",
    "smallest_eigenvector_3x3",
]
