"""exavatar_release_tpu — TPU-native expressive whole-body 3D Gaussian avatars.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
mks0601/ExAvatar_RELEASE (ECCV 2024): create an expressive whole-body 3D
Gaussian avatar (body + hands + face) from a monocular video and animate it.

Subpackages
-----------
core      : rotations, spherical harmonics, cameras, geometry
ops       : Pallas/XLA compute kernels (3DGS rasterizer, KNN, grid sampling,
            mesh rasterizer + UV texturing, SSIM/PSNR, LPIPS)
models    : SMPL-X/FLAME body-model stack (LBS, FK, subdivision, priors)
avatar    : scene + human Gaussians, losses, full model composition
train     : optax param groups, jitted train step, densify/prune, checkpoints
parallel  : device-mesh sharding (tile-sharded rendering, DP over frames)
fitting   : SMPL-X/FLAME video fitting, UV unwrap, parameter smoothing
data      : COLMAP parsing, subject loading, fitting inits, depth clouds
native    : C++ threaded decode/prefetch data loader
utils     : logging/timers, profiling/rooflines, mesh IO, visualization
apps      : CLIs — train / test / animate / evaluate / fit / preprocess
"""

__version__ = "0.1.0"
