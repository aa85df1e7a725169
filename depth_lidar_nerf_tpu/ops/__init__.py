"""Pure-functional rendering math. Everything here is jit/vmap/grad-safe."""

from depth_lidar_nerf_tpu.ops.embedding import (
    positional_encoding,
    embedding_dim,
)
from depth_lidar_nerf_tpu.ops.rays import (
    camera_rays,
    rays_by_coord,
    ndc_rays,
    patch_ray_dirs,
)
from depth_lidar_nerf_tpu.ops.sampling import (
    stratified_z_vals,
    searchsorted_right,
    sample_pdf,
)
from depth_lidar_nerf_tpu.ops.compositing import raw2outputs

__all__ = [
    "positional_encoding",
    "embedding_dim",
    "camera_rays",
    "rays_by_coord",
    "ndc_rays",
    "patch_ray_dirs",
    "stratified_z_vals",
    "searchsorted_right",
    "sample_pdf",
    "raw2outputs",
]
