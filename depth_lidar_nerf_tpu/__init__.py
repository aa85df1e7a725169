"""depth-lidar-nerf-tpu: a TPU-native depth-supervised NeRF framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
mertkiray/depth-lidar-nerf (DS-NeRF on KITTI-360 LiDAR):

- ``ops``: pure functional rendering math (positional encoding, ray
  generation, stratified + inverse-CDF sampling, alpha compositing) with a
  Pallas TPU kernel for the fused hierarchical-sampling hot path.
- ``models``: Flax modules (NeRF MLP with optional semantic head, frozen-alpha
  variant, GAN discriminators, VGG19 feature extractor).
- ``render``: the fused volumetric renderer (one XLA computation per ray
  batch; tiled ``lax.map`` for full images).
- ``train``: config system, loss stack (RGB/depth/sigma/semantic/feature/GAN/
  smoothness), jitted train steps and the training driver.
- ``data``: host-side loaders (LLFF/COLMAP poses, LiDAR depth, semantic maps)
  and the device ray batcher.
- ``parallel``: device-mesh construction and sharded (pjit/shard_map) train
  steps — data parallelism over the ray axis with XLA collectives over ICI.
- ``evaluation``: PSNR/SSIM/LPIPS metrics and offline eval CLI.

The reference implementation is single-GPU PyTorch; this package is a
TPU-first re-design, not a port. Reference call sites are cited in docstrings
as ``file:line`` for parity auditing.
"""

__version__ = "0.1.0"
