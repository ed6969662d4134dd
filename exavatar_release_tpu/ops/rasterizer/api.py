"""Public differentiable 3DGS rasterization API.

Mirrors the capability surface of the reference's GaussianRasterizer call
(reference avatar/common/nets/module.py:609-647): given world-space Gaussians
and a camera, render image + depth + mask, and expose per-Gaussian screen
radius / visibility and screen-space mean gradients (via ``mean2d_offset``)
for densification (reference avatar/main/train.py:49-54).

Pipeline (all static shapes):
  project_gaussians (pure JAX, autodiff)       [preprocess.py]
  -> global depth sort + per-tile compaction   [binning.py, int outputs]
  -> per-tile gather + tile-local quad packing (pure JAX, autodiff)
  -> tile compositing: Pallas kernels with hand-derived VJP, or the
     sequential-scan JAX oracle                [pallas_kernels.py / jax_ref.py]
  -> image assembly + background composite (pure JAX, autodiff)

Unlike the reference (batch_size==1 hard limit, avatar/main/config.py:44-45),
this function is vmap/shard_map-friendly; batching is done by the caller.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.camera import Camera
from . import jax_ref, pallas_kernels
from .binning import (
    bin_gaussians_compact,
    bin_gaussians_ragged,
    bin_gaussians_sorted,
    tile_grid,
)
from .preprocess import ScreenGaussians, pack_tile_quads, project_gaussians


@dataclasses.dataclass(frozen=True)
class RasterizeSettings:
    # taller tiles shrink the (gaussian, tile) pair count — the sort/gather/
    # scatter/binning stages all scale with it. Measured on v5e at
    # 1080p/100k: tile_h 8 -> 16 -> 32 cut pairs 1.19M -> 662k -> 399k and
    # the full fwd+bwd step ~167 -> ~123 ms; composite FLOPs stay flat
    # (pairs x P is shape-invariant). Needs the raised kernel VMEM cap
    # (pallas_kernels._compiler_params) for P = tile_h*tile_w > 1024.
    tile_h: int = 32
    tile_w: int = 128
    max_per_tile: int = 1024
    # compositing chunk: per-chunk fixed costs (done-skip reduction, loop
    # turnaround) dominate at 128 while the O(chunk) triangular-prefix cost
    # dominates at 512 (v5e 1080p/100k: 128->154 ms, 256->141, 512->190
    # full fwd+bwd) — 256 is the sweet spot. Halved automatically until it
    # divides max_per_tile.
    chunk: int = 256
    backend: str = "pallas"  # "pallas" | "ref"
    # kernel generation. 1 (default): one grid step per tile with an
    # internal count-bounded chunk loop. 2: chunked (T, K/chunk) grid with
    # scalar-prefetched counts — measured SLOWER on v5e at 1080p (41.6 vs
    # 26.6 ms fwd): v1's fori_loop already skips dead chunks, DMA is not the
    # bottleneck, and 8x more grid steps cost more than they save. Kept for
    # sparse/occupancy-skewed workloads where revisiting pays.
    kernel_v: int = 1
    # bf16 inputs for the triangular prefix matmuls (kernel_v=2 only);
    # measured NO speedup on v5e (Mosaic runs these at f32 rate regardless)
    prefix_bf16: bool = False
    # CM-kernel early-termination granularity: the tile's pixels run as
    # ``composite_sub_*`` independent row groups, each skipping remaining
    # chunks as soon as ITS pixels all terminate (one straggler pixel no
    # longer drags the whole 32x128 tile through every live chunk).
    # Forward is bit-exact for any value; backward grad accumulation splits
    # the P-contraction into partial sums (fp summation order only).
    # Separate fwd/bwd knobs: the bwd's higher per-chunk compute amortizes
    # the x-sub loop overhead, the fwd's does not (v5e 1080p/100k: fwd 27 ->
    # 39.5 ms at sub=4, bwd 53 -> 45.9 ms) — see ROUND4.md for the sweep.
    composite_sub_fwd: int = 1
    composite_sub_bwd: int = 4
    interpret: Optional[bool] = None  # None = auto (interpret off-TPU)
    # pair-major (ragged) compositing: stream a chunk-aligned pair list
    # through the composite kernels instead of dense (T, 12, K) windows —
    # work, memory, and DMA scale with the LIVE pair count and max_per_tile
    # truncation ceases to exist (binning.bin_gaussians_ragged +
    # pallas_kernels.composite_pairs_*_rg). The right mode at reference
    # density: the zero-truncation dense capacity for a 164k-Gaussian human
    # at 1080p is K=16384, where the dense path spends most of its time
    # moving empty window slots (2.42 -> measured s/itr vs this path;
    # tools/train_step_bench.py --steady). Dense stays default for
    # low-occupancy scenes where its simpler pipeline wins.
    pair_major: bool = False
    # cap on (gaussian, tile) pair expansion in the sort-based binning;
    # radii are <= ~20 px after screen-size pruning so 64 is generous
    max_tiles_per_gaussian: int = 64
    # total (gaussian, tile) pair budget for the compact binning (the
    # default); <= 0 means pairs_per_gaussian*N. Overflow drops the DEEPEST
    # Gaussians' pairs first. The sort runs on this budget instead of N*E —
    # the difference is ~73 -> ~30 ms at 1080p/100k on v5e.
    max_pairs: int = 0
    # pair budget per Gaussian when max_pairs <= 0. 16 fits dense scenes of
    # small footprints; sparse clouds of big Gaussians (e.g. a fresh COLMAP
    # scene whose KNN scale init spans meters) need more — the train loop's
    # RasterCapacityGovernor doubles this on sustained n_dropped_pairs > 0.
    pairs_per_gaussian: int = 16
    # tile-sharding over a device mesh: when set, rasterize() shards the
    # image-row axis over mesh[shard_axis] (Gaussians replicated, gradient
    # psum over ICI — the north-star sequence-parallel analog)
    mesh: Optional[object] = None  # jax.sharding.Mesh (hashable, jit-static)
    shard_axis: str = "tile"
    # caller is ALREADY inside a shard_map over this named mesh axis (of the
    # given size): render this chip's row band and all_gather the bands so
    # the full image comes back on every chip (parallel/sharded_raster.py:
    # rasterize_in_context). Enables one combined data x tile step.
    in_shard_axis: Optional[str] = None
    in_shard_size: int = 0
    # with in_shard_axis set: ALSO shard the Gaussians over the axis — each
    # chip projects/bins only its N/D slice and an all_to_all routes
    # survivors to their band owners (parallel/sharded_raster.py:
    # rasterize_gaussian_sharded_in_context). Per-chip pre-composite work
    # scales N/D·overlap instead of N.
    gaussian_shard: bool = False
    # per (src chip -> dst band) bucket capacity for the gaussian-shard
    # exchange; <= 0 auto-sizes to 4·ceil(N/D²) (128-aligned). Overflow is
    # reported per step (``exchange_overflow``) and the train loop's
    # RasterCapacityGovernor doubles this on sustained overflow.
    exchange_cap: int = 0

    def resolve_interpret(self) -> bool:
        if self.interpret is not None:
            return self.interpret
        return jax.default_backend() != "tpu"

    def resolve_chunk(self) -> int:
        c = min(self.chunk, self.max_per_tile)
        while self.max_per_tile % c:
            c //= 2
        return c

    def resolve_sub(self) -> Tuple[int, int]:
        def fit(s):
            s = max(1, s)
            while self.tile_h % s:
                s //= 2
            return s

        return fit(self.composite_sub_fwd), fit(self.composite_sub_bwd)


# --------------------------------------------------------------------------
# custom-VJP compositing boundary
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _composite(tile_quad, tile_color, tile_counts, tile_origins, tile_shape,
               chunk, interpret, kernel_v, prefix_bf16):
    """tile_origins: (T, 2) for the v1 in-kernel localization path (then
    tile_quad rows are GLOBAL conic params), or None for pre-packed rows."""
    if kernel_v == 2:
        return pallas_kernels.composite_tiles_fwd_v2(
            tile_quad, tile_color, tile_counts, tile_shape, chunk, interpret,
            prefix_bf16=prefix_bf16,
        )
    return pallas_kernels.composite_tiles_fwd(
        tile_quad, tile_color, tile_counts, tile_shape, chunk, interpret,
        tile_origins=tile_origins,
    )


def _composite_fwd(tile_quad, tile_color, tile_counts, tile_origins, tile_shape,
                   chunk, interpret, kernel_v, prefix_bf16):
    accum, tfinal = _composite(
        tile_quad, tile_color, tile_counts, tile_origins, tile_shape, chunk,
        interpret, kernel_v, prefix_bf16,
    )
    return (accum, tfinal), (
        tile_quad, tile_color, tile_counts, tile_origins, accum, tfinal
    )


def _composite_bwd(tile_shape, chunk, interpret, kernel_v, prefix_bf16, res, cot):
    tile_quad, tile_color, tile_counts, tile_origins, accum, tfinal = res
    g_accum, g_tfinal = cot
    if kernel_v == 2:
        dquad, dcolor = pallas_kernels.composite_tiles_bwd_v2(
            tile_quad, tile_color, tile_counts, g_accum, g_tfinal, accum,
            tfinal, tile_shape, chunk, interpret, prefix_bf16=prefix_bf16,
        )
    else:
        dquad, dcolor = pallas_kernels.composite_tiles_bwd(
            tile_quad, tile_color, tile_counts, g_accum, g_tfinal, accum,
            tfinal, tile_shape, chunk, interpret, tile_origins=tile_origins,
        )
    return dquad, dcolor, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _composite_cm(win, tile_counts, tile_origins, bg, tile_shape, chunk,
                  interpret, sub=(1, 1)):
    """Channel-major composite (the default v1 path): win (T, 12, K) ->
    full (T, 5, P) = [bg-composited rgb, depth, mask]. Every pallas
    operand/result keeps its minor dim at K or P — see pallas_kernels's CM
    section for why (T(8,128) layout padding). ``sub``: (fwd, bwd)
    row-group early-termination granularities (see _forward_kernel_cm)."""
    return pallas_kernels.composite_tiles_fwd_cm(
        win, tile_counts, tile_origins, bg, tile_shape, chunk, interpret,
        sub=sub[0],
    )


def _composite_cm_fwd(win, tile_counts, tile_origins, bg, tile_shape, chunk,
                      interpret, sub=(1, 1)):
    full = _composite_cm(
        win, tile_counts, tile_origins, bg, tile_shape, chunk, interpret, sub
    )
    return full, (win, tile_counts, tile_origins, bg, full)


def _composite_cm_bwd(tile_shape, chunk, interpret, sub, res, g_full):
    win, tile_counts, tile_origins, bg, full = res
    dwin = pallas_kernels.composite_tiles_bwd_cm(
        win, tile_counts, tile_origins, bg, full, g_full, tile_shape, chunk,
        interpret, sub=sub[1],
    )
    # d img_c / d bg_c = tfinal = 1 - mask (per pixel)
    tfinal = 1.0 - full[:, 4, :]  # (T, P)
    dbg = jnp.sum(g_full[:, 0:3, :] * tfinal[:, None, :], axis=(0, 2))
    return dwin, None, None, dbg


_composite_cm.defvjp(_composite_cm_fwd, _composite_cm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _composite_rg(rows, tid, flags, bg, oy_off, tile_shape, num_tiles, chunk,
                  nx, interpret, sub_bwd=1):
    """Ragged pair-major composite: rows (12, Pa) chunk-aligned pair rows ->
    full (T, 5, P). Differentiable in rows and bg. ``sub_bwd``: backward
    row-group early-termination granularity (see _backward_kernel_rg)."""
    return pallas_kernels.composite_pairs_fwd_rg(
        rows, tid, flags, bg, oy_off, tile_shape, num_tiles, chunk, nx,
        interpret,
    )


def _composite_rg_fwd(rows, tid, flags, bg, oy_off, tile_shape, num_tiles,
                      chunk, nx, interpret, sub_bwd=1):
    full = _composite_rg(rows, tid, flags, bg, oy_off, tile_shape, num_tiles,
                         chunk, nx, interpret, sub_bwd)
    return full, (rows, tid, flags, bg, oy_off, full)


def _composite_rg_bwd(tile_shape, num_tiles, chunk, nx, interpret, sub_bwd,
                      res, g_full):
    rows, tid, flags, bg, oy_off, full = res
    drows = pallas_kernels.composite_pairs_bwd_rg(
        rows, tid, flags, bg, oy_off, full, g_full, tile_shape, num_tiles,
        chunk, nx, interpret, sub=sub_bwd,
    )
    tfinal = 1.0 - full[:, 4, :]  # (T, P)
    dbg = jnp.sum(g_full[:, 0:3, :] * tfinal[:, None, :], axis=(0, 2))
    return drows, None, None, dbg, None


_composite_rg.defvjp(_composite_rg_fwd, _composite_rg_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    rgbs: jnp.ndarray,
    live: jnp.ndarray,
    cam: Camera,
    img_shape: Tuple[int, int],
    bg: jnp.ndarray,
    settings: RasterizeSettings = RasterizeSettings(),
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Differentiable render of N world-space Gaussians.

    Returns dict with:
      img   (H, W, 3)  alpha-composited color over ``bg``
      depth (H, W)     expected view-space depth (sum of w_i * z_i)
      mask  (H, W)     accumulated alpha (1 - final transmittance)
      mean2d (N, 2), radius (N,), is_vis (N,)  — densification stats
    """
    if settings.in_shard_axis is not None:
        from ...parallel.sharded_raster import (
            rasterize_gaussian_sharded_in_context, rasterize_in_context,
        )

        inner = dataclasses.replace(
            settings, in_shard_axis=None, in_shard_size=0, gaussian_shard=False
        )
        if settings.gaussian_shard:
            return rasterize_gaussian_sharded_in_context(
                means3d, scales, quats, opacities, rgbs, live, cam, img_shape,
                bg, settings.in_shard_axis, settings.in_shard_size, inner,
                cap=settings.exchange_cap, mean2d_offset=mean2d_offset,
            )
        return rasterize_in_context(
            means3d, scales, quats, opacities, rgbs, live, cam, img_shape, bg,
            settings.in_shard_axis, settings.in_shard_size, inner,
            mean2d_offset=mean2d_offset,
        )

    if settings.mesh is not None:
        from ...parallel.sharded_raster import rasterize_sharded

        return rasterize_sharded(
            means3d, scales, quats, opacities, rgbs, live, cam, img_shape, bg,
            settings.mesh, settings.shard_axis,
            dataclasses.replace(settings, mesh=None),
            mean2d_offset=mean2d_offset,
        )

    H, W = int(img_shape[0]), int(img_shape[1])
    th, tw = settings.tile_h, settings.tile_w
    ny, nx = tile_grid((H, W), th, tw)
    n = means3d.shape[0]

    screen = project_gaussians(
        means3d, scales, quats, opacities, rgbs, live, cam, (H, W), mean2d_offset
    )

    max_pairs = (
        settings.max_pairs if settings.max_pairs > 0
        else settings.pairs_per_gaussian * n
    )

    if settings.pair_major and settings.backend != "ref":
        # ragged pair-major path: no (T, K) tables, no truncation — see
        # RasterizeSettings.pair_major. The (12, chunk) pair blocks need
        # their minor dim 128-aligned for the Mosaic lowering.
        chunk = max(128, -(-settings.chunk // 128) * 128)
        rb = bin_gaussians_ragged(
            jax.lax.stop_gradient(screen.mean2d),
            jax.lax.stop_gradient(screen.radius),
            jax.lax.stop_gradient(screen.depth),
            screen.in_frustum,
            (H, W), th, tw, chunk=chunk, max_pairs=max_pairs,
            extent=jax.lax.stop_gradient(screen.extent),
        )
        sentinel = jnp.zeros((1, 12), jnp.float32).at[0, 5].set(-1e9)
        rows = jnp.concatenate([screen.params, screen.color], axis=1)
        order_pad = jnp.concatenate(
            [rb.order, jnp.array([n], jnp.int32)], axis=0
        )
        g2 = order_pad[rb.pair_rank]  # (Pa,) original row ids; n = sentinel
        rows_pad = jnp.concatenate([rows, sentinel], axis=0)
        rows2 = jnp.swapaxes(rows_pad[g2], 0, 1)  # (12, Pa) channel-major
        full_t = _composite_rg(
            rows2, rb.tid, rb.flags, bg, jnp.float32(0.0), (th, tw),
            ny * nx, chunk, nx, settings.resolve_interpret(),
            settings.resolve_sub()[1],
        )  # (T, 5, P)
        full = (
            full_t.reshape(ny, nx, 5, th, tw)
            .transpose(0, 3, 1, 4, 2)
            .reshape(ny * th, nx * tw, 5)[:H, :W]
        )
        return {
            "img": full[..., 0:3],
            "depth": full[..., 3],
            "mask": full[..., 4],
            "mean2d": screen.mean2d,
            "radius": screen.radius,
            "is_vis": screen.radius > 0,
            "tile_counts": rb.tile_counts,
            "n_dropped": rb.n_dropped_pairs,
            "n_dropped_pairs": rb.n_dropped_pairs,
            "n_truncated": rb.n_truncated,
        }

    binning = bin_gaussians_compact(
        jax.lax.stop_gradient(screen.mean2d),
        jax.lax.stop_gradient(screen.radius),
        jax.lax.stop_gradient(screen.depth),
        screen.in_frustum,
        (H, W),
        th,
        tw,
        settings.max_per_tile,
        max_pairs=max_pairs,
        extent=screen.extent,
    )

    # depth-sorted gather with a sentinel row (log_op = -1e9 → zero alpha).
    # params and color are fused into ONE 12-channel row table so both the
    # forward gather and its scatter-add transpose pay the per-row engine
    # cost once, not twice.
    # NOTE: a scatter-free gather backward exists (binning.tile_gather,
    # summing cotangents through the pair-sort inverse permutation) but
    # measured SLOWER on v5e at 1080p/100k (431 ms vs 279 ms full step):
    # with E=64 pair lanes it reads ~3x the bytes the scatter-add writes.
    # XLA's scatter-add transpose of this gather is the faster default.
    sentinel = jnp.zeros((1, 12), jnp.float32).at[0, 5].set(-1e9)
    rows = jnp.concatenate([screen.params, screen.color], axis=1)
    # compose the depth-sort permutation into the indices (int32) instead of
    # physically reordering the 12-channel f32 rows: kills one (N, 12)
    # gather in the forward AND its scatter-add transpose in the backward
    order_pad = jnp.concatenate(
        [binning.order, jnp.array([n], jnp.int32)], axis=0
    )
    gidx = order_pad[binning.tile_indices]  # (T, K) original-row ids
    rows_pad = jnp.concatenate([rows, sentinel], axis=0)
    tile_rows = rows_pad[gidx]  # (T, K, 12)
    tile_params = tile_rows[..., :8]
    tile_color = tile_rows[..., 8:]

    t_ids = jnp.arange(ny * nx, dtype=jnp.int32)
    origins = jnp.stack(
        [(t_ids % nx) * tw, (t_ids // nx) * th], axis=1
    ).astype(jnp.float32)

    if settings.backend == "ref":
        # direct conic evaluation from GLOBAL rows — the same fp expression
        # the v1 Pallas kernel uses, so oracle-vs-kernel parity is tight
        accum, tfinal = jax_ref.composite_tiles_ref(
            tile_params, tile_color, (th, tw),
            tile_origins=jax.lax.stop_gradient(origins),
        )
    elif settings.kernel_v == 2:
        # v2 kernels keep the legacy pre-packed contract
        tile_quad = pack_tile_quads(tile_params, origins[:, None, :])
        accum, tfinal = _composite(
            tile_quad,
            tile_color,
            binning.tile_counts,
            None,
            (th, tw),
            settings.resolve_chunk(),
            settings.resolve_interpret(),
            settings.kernel_v,
            settings.prefix_bf16,
        )
    else:
        # v1 (default): channel-major boundary. GLOBAL conic rows, in-kernel
        # tile localization, bg composited in-kernel.
        win = jnp.swapaxes(tile_rows, 1, 2)  # (T, 12, K)
        full_t = _composite_cm(
            win,
            binning.tile_counts,
            jax.lax.stop_gradient(origins),
            bg,
            (th, tw),
            settings.resolve_chunk(),
            settings.resolve_interpret(),
            settings.resolve_sub(),
        )  # (T, 5, P)
        full = (
            full_t.reshape(ny, nx, 5, th, tw)
            .transpose(0, 3, 1, 4, 2)
            .reshape(ny * th, nx * tw, 5)[:H, :W]
        )
        accum = None

    if accum is not None:
        # ref / v2 backends: background composite + assembly in XLA
        rgb_tiles = accum[..., 0:3] + tfinal * bg[None, None, :]
        full = jnp.concatenate(
            [rgb_tiles, accum[..., 3:4], 1.0 - tfinal], axis=-1
        )
        full = full.reshape(ny, nx, th, tw, 5)
        full = full.transpose(0, 2, 1, 3, 4).reshape(ny * th, nx * tw, 5)
        full = full[:H, :W]

    return {
        "img": full[..., 0:3],
        "depth": full[..., 3],
        "mask": full[..., 4],
        "mean2d": screen.mean2d,
        "radius": screen.radius,
        "is_vis": screen.radius > 0,
        "tile_counts": binning.tile_counts,
        # pairs silently lost to static capacities; the train loop surfaces
        # nonzero values AND auto-grows the matching capacity (a cropped
        # Gaussian footprint is a silent-quality + broken-gradient bug):
        #   n_dropped_pairs -> the max_pairs/pairs_per_gaussian budget,
        #   n_truncated     -> the per-tile max_per_tile cap.
        "n_dropped": binning.n_dropped_pairs + binning.n_truncated,
        "n_dropped_pairs": binning.n_dropped_pairs,
        "n_truncated": binning.n_truncated,
    }
