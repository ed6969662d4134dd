"""Tile(row)-sharded differentiable 3DGS rasterization over a device mesh.

The north-star mapping for this workload (SURVEY.md §5: the scalable axis is
pixels/tiles, not sequence): shard the image's tile-row axis across chips.
Per chip: bin the (replicated, frustum-culled) Gaussians against its own row
band, composite its tiles, emit its image slice. Under ``shard_map``
autodiff, the transpose of the replicated-Gaussian broadcast is exactly the
gradient ``psum`` over ICI the north star calls for — XLA inserts it.

Communication analysis: forward sends nothing (Gaussians are replicated by
sharding constraint; each chip reads them from its own HBM copy); backward
all-reduces one (N, ...) Gaussian-gradient pytree — the psum rides ICI.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..ops.rasterizer import jax_ref, pallas_kernels
from ..ops.rasterizer.api import RasterizeSettings, _composite
from ..ops.rasterizer.binning import bin_gaussians, tile_grid
from ..ops.rasterizer.preprocess import pack_tile_quads, project_gaussians


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def rasterize_sharded(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    rgbs: jnp.ndarray,
    live: jnp.ndarray,
    cam: Camera,
    img_shape: Tuple[int, int],
    bg: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tile",
    settings: RasterizeSettings = RasterizeSettings(),
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Differentiable render with image rows sharded over ``mesh[axis]``.

    Returns the same dict as ``ops.rasterizer.api.rasterize``; ``img``/
    ``depth``/``mask`` come back sharded over rows (P(axis) layout),
    per-Gaussian stats replicated.
    """
    H, W = int(img_shape[0]), int(img_shape[1])
    th, tw = settings.tile_h, settings.tile_w
    D = mesh.shape[axis]
    # pad H so each device owns an equal whole number of tile rows
    Hp = _round_up(H, th * D)
    rows_per_dev = Hp // D
    ny_local, nx = tile_grid((rows_per_dev, W), th, tw)

    screen = project_gaussians(
        means3d, scales, quats, opacities, rgbs, live, cam, (H, W), mean2d_offset
    )

    sentinel_p = jnp.zeros((1, 8), jnp.float32).at[0, 5].set(-1e9)
    sentinel_c = jnp.zeros((1, 4), jnp.float32)

    interpret = settings.resolve_interpret()
    use_ref = settings.backend == "ref"

    def shard_fn(params, color, mean2d, radius, depth, visible):
        d = jax.lax.axis_index(axis)
        row0 = (d * rows_per_dev).astype(jnp.float32)
        # shift to the device's local viewport
        m2d_local = mean2d - jnp.stack(
            [jnp.zeros_like(row0), row0]
        )[None, :]
        binning = bin_gaussians(
            jax.lax.stop_gradient(m2d_local),
            jax.lax.stop_gradient(radius),
            jax.lax.stop_gradient(depth),
            visible,
            (rows_per_dev, W),
            th,
            tw,
            settings.max_per_tile,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
        )
        params_pad = jnp.concatenate([params[binning.order], sentinel_p], axis=0)
        color_pad = jnp.concatenate([color[binning.order], sentinel_c], axis=0)
        tile_params = params_pad[binning.tile_indices]
        tile_color = color_pad[binning.tile_indices]

        t_ids = jnp.arange(ny_local * nx, dtype=jnp.int32)
        origins = jnp.stack(
            [(t_ids % nx) * tw, (t_ids // nx) * th], axis=1
        ).astype(jnp.float32)
        # tile origins in GLOBAL pixel coords to match global conic params
        origins = origins + jnp.stack([jnp.zeros_like(row0), row0])[None, :]

        if use_ref:
            tile_quad = pack_tile_quads(tile_params, origins[:, None, :])
            accum, tfinal = jax_ref.composite_tiles_ref(
                tile_quad, tile_color, (th, tw)
            )
        else:
            # GLOBAL rows + per-tile origins: localization happens in-kernel
            accum, tfinal = _composite(
                tile_params, tile_color, binning.tile_counts,
                jax.lax.stop_gradient(origins),
                (th, tw), settings.chunk, interpret,
                settings.kernel_v, settings.prefix_bf16,
            )

        rgb_tiles = accum[..., 0:3] + tfinal * bg[None, None, :]
        full = jnp.concatenate(
            [rgb_tiles, accum[..., 3:4], 1.0 - tfinal], axis=-1
        )
        full = full.reshape(ny_local, nx, th, tw, 5)
        full = full.transpose(0, 2, 1, 3, 4).reshape(ny_local * th, nx * tw, 5)
        return full[:, :W]  # (rows_per_dev, W, 5)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    full = sharded(
        screen.params, screen.color, screen.mean2d, screen.radius,
        screen.depth, screen.in_frustum,
    )  # (Hp, W, 5)
    full = full[:H]

    return {
        "img": full[..., 0:3],
        "depth": full[..., 3],
        "mask": full[..., 4],
        "mean2d": screen.mean2d,
        "radius": screen.radius,
        "is_vis": screen.radius > 0,
    }
