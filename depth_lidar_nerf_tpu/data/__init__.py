"""Host-side data loading (numpy/PIL): LLFF poses, LiDAR depth, semantics.

These are offline CPU paths by design (SURVEY.md §7: "LLFF/COLMAP pose loading
kept host-side"); nothing here runs per training step.
"""

from depth_lidar_nerf_tpu.data.llff import load_llff_data
from depth_lidar_nerf_tpu.data.depth import load_lidar_depth, load_colmap_depth
from depth_lidar_nerf_tpu.data.semantic import load_semantic_data

__all__ = [
    "load_llff_data",
    "load_lidar_depth",
    "load_colmap_depth",
    "load_semantic_data",
]
