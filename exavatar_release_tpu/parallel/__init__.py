"""Multi-chip parallelism: device meshes, tile-sharded rendering, DP training.

The reference is strictly single-GPU (reference avatar/common/base.py:125:
a degenerate single-process DataParallel with num_gpus=1). This package is
new capability, designed for TPU slices per the project north star:

* image tiles sharded across chips (the workload's sequence-parallel
  analog) — Gaussians replicated, per-chip tile binning + compositing,
  gradient psum over the replicated Gaussian parameters;
* data parallelism over frames/subjects across hosts;
* everything expressed with jax.sharding.Mesh + shard_map, so XLA inserts
  the ICI/DCN collectives.
"""
from .mesh import init_distributed, make_host_mesh, make_mesh
from .sharded_raster import (
    rasterize_gaussian_sharded,
    rasterize_in_context,
    rasterize_sharded,
)
from .dp_train import dp_train_step, replicate_to_mesh
from .dp_tile_train import dp_tile_train_step

__all__ = [
    "init_distributed",
    "make_host_mesh",
    "make_mesh",
    "rasterize_sharded",
    "rasterize_gaussian_sharded",
    "rasterize_in_context",
    "dp_train_step",
    "dp_tile_train_step",
    "replicate_to_mesh",
]
