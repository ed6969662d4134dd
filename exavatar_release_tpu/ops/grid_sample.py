"""Bilinear grid sampling (torch ``F.grid_sample`` semantics) in pure JAX.

The reference samples triplane features with
``F.grid_sample(plane, coords)`` using torch defaults — bilinear,
``align_corners=False``, zero padding (reference
avatar/common/nets/module.py:424-457). This implements exactly those
semantics as gather + lerp, which XLA fuses; the caller batches with vmap.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (C, H, W) at normalized ``coords`` (N, 2) in [-1, 1].

    coords[:, 0] = x indexes W; coords[:, 1] = y indexes H (torch layout).
    align_corners=False: pixel centers at (i + 0.5) / size * 2 - 1.
    Out-of-range samples read zeros (zero padding). Returns (N, C).
    """
    C, H, W = feat.shape
    x = (coords[:, 0] + 1.0) * (W * 0.5) - 0.5
    y = (coords[:, 1] + 1.0) * (H * 0.5) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        v = feat[:, yc, xc]  # (C, N)
        return jnp.where(inside[None, :], v, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)

    top = v00 * (1.0 - tx)[None] + v01 * tx[None]
    bot = v10 * (1.0 - tx)[None] + v11 * tx[None]
    out = top * (1.0 - ty)[None] + bot * ty[None]
    return out.T  # (N, C)


def triplane_sample(triplane: jnp.ndarray, xyz: jnp.ndarray,
                    half_extent: jnp.ndarray) -> jnp.ndarray:
    """Sample a 3-plane feature volume at 3D points.

    triplane: (3, C, H, W) — planes ordered (xy, xz, yz) like the reference
    (module.py:437-441); xyz: (N, 3) centered coordinates;
    half_extent: (3,) normalization half-sizes (cfg.triplane_shape_3d / 2).
    Returns (N, 3C) concatenated plane features.
    """
    n = xyz / half_extent[None, :]
    xy = n[:, (0, 1)]
    xz = n[:, (0, 2)]
    yz = n[:, (1, 2)]
    f_xy = grid_sample_2d(triplane[0], xy)
    f_xz = grid_sample_2d(triplane[1], xz)
    f_yz = grid_sample_2d(triplane[2], yz)
    return jnp.concatenate([f_xy, f_xz, f_yz], axis=1)
