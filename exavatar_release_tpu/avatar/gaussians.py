"""Render-ready Gaussian asset pytree shared by scene/human modules.

The reference passes dicts of tensors between modules
(avatar/common/nets/module.py:265-272,564-580); here the same payload is a
typed pytree that the rasterizer consumes directly. ``live`` carries the
fixed-capacity validity mask (TPU static shapes; absent in the reference,
which reallocates tensors instead).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class GaussianAssets(NamedTuple):
    mean_3d: jnp.ndarray  # (N, 3) world
    opacity: jnp.ndarray  # (N, 1) in [0, 1]
    scale: jnp.ndarray  # (N, 3) linear
    rotation: jnp.ndarray  # (N, 4) wxyz unit quaternions
    rgb: jnp.ndarray  # (N, 3)
    live: jnp.ndarray  # (N,) bool

    @property
    def num(self) -> int:
        return self.mean_3d.shape[0]


def concat_assets(a: GaussianAssets, b: GaussianAssets) -> GaussianAssets:
    """Scene+human composition (reference avatar/main/model.py:119-127)."""
    return GaussianAssets(
        mean_3d=jnp.concatenate([a.mean_3d, b.mean_3d], axis=0),
        opacity=jnp.concatenate([a.opacity, b.opacity], axis=0),
        scale=jnp.concatenate([a.scale, b.scale], axis=0),
        rotation=jnp.concatenate([a.rotation, b.rotation], axis=0),
        rgb=jnp.concatenate([a.rgb, b.rgb], axis=0),
        live=jnp.concatenate([a.live, b.live], axis=0),
    )


def detach_assets(a: GaussianAssets) -> GaussianAssets:
    import jax

    return jax.tree.map(jax.lax.stop_gradient, a)
