from icpx.distributed.mesh import make_mesh, mesh_shape_for
from icpx.distributed.ring import ring_nearest_neighbor
from icpx.distributed.sharded_icp import sharded_register

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "ring_nearest_neighbor",
    "sharded_register",
]
