from icpx.io.pcd import read_pcd, write_pcd
from icpx.io.ply import read_ply, write_ply
from icpx.io.xyz import read_xyz_txt, write_xyz_txt
from icpx.io.loaders import load_cloud, save_cloud
from icpx.io.prefetch import ScanPrefetcher, prefetch_kitti

__all__ = [
    "read_pcd",
    "write_pcd",
    "read_ply",
    "write_ply",
    "read_xyz_txt",
    "write_xyz_txt",
    "load_cloud",
    "save_cloud",
    "ScanPrefetcher",
    "prefetch_kitti",
]
