from icpx.utils.metrics import MetricsLogger, icp_iteration_records
from icpx.utils.profiling import Timer, kernel_speed_of_light, trace_context
from icpx.utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "MetricsLogger",
    "icp_iteration_records",
    "Timer",
    "kernel_speed_of_light",
    "trace_context",
    "save_checkpoint",
    "load_checkpoint",
]
