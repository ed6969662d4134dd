"""Tile binning: global depth sort + per-tile index compaction.

The reference's CUDA rasterizer duplicates (Gaussian, tile) pairs and radix-
sorts by (tile | depth) keys — a GPU-shaped algorithm. The TPU-native
equivalent used here: ONE global argsort by view depth (XLA sort), then for
each image tile a masked compaction of the sorted index list against the
Gaussian's screen rectangle (CUDA ``getRect`` semantics). Restricted to any
tile, a globally depth-sorted list gives exactly the per-tile depth order the
CUDA sorter produces, so compositing order matches the reference.

Everything is static-shape: each tile holds at most ``max_per_tile`` indices;
overflow is counted and reported so capacity can be raised. Compaction is
O(num_tiles × N) vector work, chunked with ``lax.map`` to bound memory.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    order: jnp.ndarray  # (N,) int32 — Gaussian indices sorted by depth
    tile_indices: jnp.ndarray  # (T, K) int32 into the SORTED array; N = sentinel
    tile_counts: jnp.ndarray  # (T,) int32 — number of valid entries (uncapped)
    num_tiles: Tuple[int, int]  # (ny, nx) static


def tile_grid(img_shape: Tuple[int, int], tile_h: int, tile_w: int) -> Tuple[int, int]:
    H, W = img_shape
    return (-(-H // tile_h), -(-W // tile_w))


@functools.partial(
    jax.jit, static_argnames=("img_shape", "tile_h", "tile_w", "max_per_tile")
)
def bin_gaussians(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,
    visible: jnp.ndarray,
    img_shape: Tuple[int, int],
    tile_h: int = 8,
    tile_w: int = 128,
    max_per_tile: int = 1024,
) -> TileBinning:
    """All inputs are per-Gaussian (N,...); returns static-shape binning."""
    n = mean2d.shape[0]
    ny, nx = tile_grid(img_shape, tile_h, tile_w)
    num_tiles = ny * nx

    # global front-to-back order (culled Gaussians sink to the end)
    sort_key = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)

    m2d = mean2d[order]
    rad = radius[order]
    vis = visible[order] & (rad > 0)

    # CUDA getRect: tile-space rectangle [lo, hi) covered by the Gaussian
    x_lo = jnp.clip(jnp.floor((m2d[:, 0] - rad) / tile_w), 0, nx).astype(jnp.int32)
    x_hi = jnp.clip(
        jnp.floor((m2d[:, 0] + rad + tile_w - 1) / tile_w), 0, nx
    ).astype(jnp.int32)
    y_lo = jnp.clip(jnp.floor((m2d[:, 1] - rad) / tile_h), 0, ny).astype(jnp.int32)
    y_hi = jnp.clip(
        jnp.floor((m2d[:, 1] + rad + tile_h - 1) / tile_h), 0, ny
    ).astype(jnp.int32)

    gauss_idx = jnp.arange(n, dtype=jnp.int32)

    def one_tile(t):
        ty, tx = t // nx, t % nx
        hit = vis & (x_lo <= tx) & (tx < x_hi) & (y_lo <= ty) & (ty < y_hi)
        count = jnp.sum(hit.astype(jnp.int32))
        pos = jnp.cumsum(hit.astype(jnp.int32)) - 1  # output slot per hit
        slots = jnp.where(hit, pos, max_per_tile)  # overflow/miss -> dropped
        out = jnp.full((max_per_tile,), n, dtype=jnp.int32)
        out = out.at[slots].set(gauss_idx, mode="drop")
        return out, count

    # chunk tiles through lax.map to bound the (tiles x N) mask working set
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    chunk = min(256, num_tiles)
    pad = -num_tiles % chunk
    tile_ids_p = jnp.pad(tile_ids, (0, pad)).reshape(-1, chunk)
    idxs, counts = jax.lax.map(jax.vmap(one_tile), tile_ids_p)
    tile_indices = idxs.reshape(-1, max_per_tile)[:num_tiles]
    tile_counts = counts.reshape(-1)[:num_tiles]
    return TileBinning(
        order=order,
        tile_indices=tile_indices,
        tile_counts=tile_counts,
        num_tiles=(ny, nx),
    )
