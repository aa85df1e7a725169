"""Evaluation: PSNR/SSIM/LPIPS metrics and the offline metrics CLI."""

from depth_lidar_nerf_tpu.evaluation.metrics import psnr, ssim_np

__all__ = ["psnr", "ssim_np"]
