from icpx.distributed.mesh import make_mesh, mesh_shape_for
from icpx.distributed.ring import ring_nearest_neighbor
from icpx.distributed.sharded_icp import sharded_register, sharded_register_pairs
from icpx.distributed.map_ep import (
    MapBlocks,
    partition_map,
    routed_map_nn,
    sharded_map_register,
)
from icpx.distributed.pipeline import pipelined_pyramid_register
from icpx.distributed.fault import (
    CollectiveStallError,
    HeartbeatMonitor,
    corrupt_points,
    drop_shard,
    guarded_call,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "ring_nearest_neighbor",
    "sharded_register",
    "sharded_register_pairs",
    "MapBlocks",
    "partition_map",
    "routed_map_nn",
    "sharded_map_register",
    "pipelined_pyramid_register",
    "CollectiveStallError",
    "HeartbeatMonitor",
    "guarded_call",
    "drop_shard",
    "corrupt_points",
]
