"""Fused volumetric renderer."""

from depth_lidar_nerf_tpu.render.renderer import (
    RenderConfig,
    Rays,
    make_rays,
    render_rays,
    render_rays_tiled,
    render_image,
)

__all__ = [
    "RenderConfig",
    "Rays",
    "make_rays",
    "render_rays",
    "render_rays_tiled",
    "render_image",
]
