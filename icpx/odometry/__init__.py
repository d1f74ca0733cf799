from icpx.odometry.frontend import OdometryConfig, OdometryResult, run_odometry
from icpx.odometry.posegraph import PoseGraph, optimize_pose_graph
from icpx.odometry.evaluate import ate_rmse, rpe

__all__ = [
    "OdometryConfig",
    "OdometryResult",
    "run_odometry",
    "PoseGraph",
    "optimize_pose_graph",
    "ate_rmse",
    "rpe",
]
