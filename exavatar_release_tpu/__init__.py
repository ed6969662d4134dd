"""exavatar_release_tpu — TPU-native expressive whole-body 3D Gaussian avatars.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
mks0601/ExAvatar_RELEASE (ECCV 2024): create an expressive whole-body 3D
Gaussian avatar (body + hands + face) from a monocular video and animate it.

Subpackages
-----------
core      : rotations, spherical harmonics, cameras, geometry, filters, mesh IO
ops       : Pallas/XLA compute kernels (3DGS rasterizer, KNN, mesh raster, SSIM, LPIPS)
models    : SMPL-X/FLAME body-model stack, scene/human Gaussian modules, avatar model
train     : functional train step, optax param groups, densify/prune, checkpointing
parallel  : device-mesh sharding of tiles/frames with XLA collectives
fitting   : SMPL-X/FLAME video fitting, UV texture unwrap, parameter smoothing
data      : COLMAP/NeuMan/Custom/XHumans dataset loaders
tools     : evaluation (PSNR/SSIM/LPIPS), animation, turntables
"""

__version__ = "0.1.0"
