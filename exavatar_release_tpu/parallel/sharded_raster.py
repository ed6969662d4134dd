"""Tile(row)-sharded differentiable 3DGS rasterization over a device mesh.

The north-star mapping for this workload (SURVEY.md §5: the scalable axis is
pixels/tiles, not sequence): shard the image's tile-row axis across chips.
Per chip: bin the (replicated, frustum-culled) Gaussians against its own row
band, composite its tiles, emit its image slice. Under ``shard_map``
autodiff, the transpose of the replicated-Gaussian broadcast is exactly the
gradient ``psum`` over ICI the north star calls for — XLA inserts it.

Two entry points:

- ``rasterize_sharded``: standalone — owns its own ``shard_map`` and returns
  row-sharded images (the original round-1 API).
- ``rasterize_in_context``: for callers ALREADY inside a ``shard_map`` whose
  mesh has the tile axis (e.g. the combined data x tile training step,
  parallel/dp_tile_train.py). Renders this chip's row band, then
  ``all_gather``s the bands over the axis so every chip returns the full
  image — downstream per-image losses run unchanged, and the gather's
  transpose (reduce-scatter) routes each band's pixel cotangent back to its
  owner chip.

Communication analysis: forward sends one (rows/D, W, 5) slab per chip
(in-context all_gather) or nothing (standalone; images stay sharded);
backward all-reduces the (N, ...) Gaussian-gradient pytree — both ride ICI.

``rasterize_gaussian_sharded`` goes further (the north-star exchange,
SURVEY.md §2 "Distributed backend"): the GAUSSIANS are also sharded over the
tile axis. Each chip projects only its N/D Gaussians, band-culls them, and an
``all_to_all`` routes each survivor to the chips whose row band it touches —
per-chip projection, binning, and compositing all scale as N/D·overlap
instead of N. The exchange transpose (all_to_all is its own transpose, up to
reversal) routes parameter cotangents back to each Gaussian's owner chip, so
gradients need no extra psum.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..ops.rasterizer import jax_ref, pallas_kernels
from ..ops.rasterizer.api import RasterizeSettings, _composite_cm
from ..ops.rasterizer.binning import bin_gaussians, tile_grid
from ..ops.rasterizer.preprocess import project_gaussians


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_exchange_cap(n: int, d: int) -> int:
    """The auto per-(src chip → dst band) bucket capacity used by the
    gaussian-sharded paths when ``settings.exchange_cap <= 0``:
    4·ceil(N/D²) (≥ 4x the uniform-scene expectation), 128-aligned, and
    never more than the per-chip slice N/D. Exported so capacity policy
    (train.loop.RasterCapacityGovernor) can grow FROM this resolved value
    instead of replacing an auto cap with a smaller explicit one."""
    n_pad = _round_up(n, d)
    cap = _round_up(max(4 * (-(-n_pad // (d * d))), 128), 128)
    return min(cap, n_pad // d)


def _render_band(
    params: jnp.ndarray,
    color: jnp.ndarray,
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,
    visible: jnp.ndarray,
    axis: str,
    rows_per_dev: int,
    W: int,
    settings: RasterizeSettings,
    bg: jnp.ndarray,
    extent: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render THIS chip's row band; must run inside a shard_map over
    ``axis``. Returns (rows_per_dev, W, 5) = [bg-composited rgb, depth,
    mask] — the same channel contract AND the same channel-major Pallas
    kernels as the single-device api path, so sharded-vs-single parity is
    by construction: a *different* kernel formulation here (the old
    row-major v1 path) produced fp deviations at the sticky
    early-termination margin T·(1−α) ≈ 1e-4, flipping whole pixel tails and
    their gradients (caught at 512x896/100k, ~0.3%% of grad elements off by
    up to 15%%). ``extent`` (N, 2): tight per-axis AABBs
    (translation-invariant, so the band viewport shift leaves them valid).
    """
    th, tw = settings.tile_h, settings.tile_w
    ny_local, nx = tile_grid((rows_per_dev, W), th, tw)
    interpret = settings.resolve_interpret()
    use_ref = settings.backend == "ref"

    d = jax.lax.axis_index(axis)
    row0 = (d * rows_per_dev).astype(jnp.float32)

    if settings.pair_major and not use_ref:
        # ragged pair-major band: same global-coords contract (integer
        # tile-row offset into the binning, global row offset into the
        # kernel's pixel coords) — see RasterizeSettings.pair_major
        from ..ops.rasterizer.api import _composite_rg
        from ..ops.rasterizer.binning import bin_gaussians_ragged

        chunk = max(128, -(-settings.chunk // 128) * 128)
        n_loc = params.shape[0]
        max_pairs = (
            settings.max_pairs if settings.max_pairs > 0
            else settings.pairs_per_gaussian * n_loc
        )
        rb = bin_gaussians_ragged(
            jax.lax.stop_gradient(mean2d),
            jax.lax.stop_gradient(radius),
            jax.lax.stop_gradient(depth),
            visible,
            (rows_per_dev, W), th, tw, chunk=chunk, max_pairs=max_pairs,
            extent=None if extent is None else jax.lax.stop_gradient(extent),
            tile_row_offset=d * (rows_per_dev // th),
        )
        sentinel = jnp.zeros((1, 12), jnp.float32).at[0, 5].set(-1e9)
        order_pad = jnp.concatenate(
            [rb.order, jnp.array([n_loc], jnp.int32)], axis=0
        )
        g2 = order_pad[rb.pair_rank]
        rows_pad = jnp.concatenate(
            [jnp.concatenate([params, color], axis=1), sentinel], axis=0
        )
        rows2 = jnp.swapaxes(rows_pad[g2], 0, 1)  # (12, Pa)
        full_t = _composite_rg(
            rows2, rb.tid, rb.flags, bg, row0, (th, tw),
            ny_local * nx, chunk, nx, interpret,
            settings.resolve_sub()[1],
        )  # (T_local, 5, P)
        full = (
            full_t.reshape(ny_local, nx, 5, th, tw)
            .transpose(0, 3, 1, 4, 2)
            .reshape(ny_local * th, nx * tw, 5)
        )
        dropped = jnp.stack([rb.n_dropped_pairs, rb.n_truncated])
        return full[:, :W], dropped

    # bin on GLOBAL coords with the viewport expressed as an integer
    # tile-row offset — bit-identical tile membership vs the single-device
    # path (an f32 origin shift of mean2d rounds differently at tile
    # boundaries; see binning._tile_rect)
    binning = bin_gaussians(
        jax.lax.stop_gradient(mean2d),
        jax.lax.stop_gradient(radius),
        jax.lax.stop_gradient(depth),
        visible,
        (rows_per_dev, W),
        th,
        tw,
        settings.max_per_tile,
        max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
        extent=None if extent is None else jax.lax.stop_gradient(extent),
        tile_row_offset=d * (rows_per_dev // th),
    )
    # compose the depth-sort permutation into the int32 indices instead of
    # reordering the f32 rows (see ops/rasterizer/api.py)
    n_loc = params.shape[0]
    order_pad = jnp.concatenate(
        [binning.order, jnp.array([n_loc], jnp.int32)], axis=0
    )
    gidx = order_pad[binning.tile_indices]
    sentinel = jnp.zeros((1, 12), jnp.float32).at[0, 5].set(-1e9)
    rows_pad = jnp.concatenate(
        [jnp.concatenate([params, color], axis=1), sentinel], axis=0
    )
    tile_rows = rows_pad[gidx]  # (T, K, 12)

    t_ids = jnp.arange(ny_local * nx, dtype=jnp.int32)
    origins = jnp.stack(
        [(t_ids % nx) * tw, (t_ids // nx) * th], axis=1
    ).astype(jnp.float32)
    # tile origins in GLOBAL pixel coords to match global conic params
    origins = origins + jnp.stack([jnp.zeros_like(row0), row0])[None, :]

    if use_ref:
        accum, tfinal = jax_ref.composite_tiles_ref(
            tile_rows[..., :8], tile_rows[..., 8:], (th, tw),
            tile_origins=jax.lax.stop_gradient(origins),
        )
        # same bg-composite expression as the CM kernel emits
        full_t = jnp.concatenate(
            [
                (accum[..., 0:3] + tfinal * bg[None, None, :]),
                accum[..., 3:4],
                1.0 - tfinal,
            ],
            axis=-1,
        ).swapaxes(1, 2)  # (T, 5, P)
    else:
        win = jnp.swapaxes(tile_rows, 1, 2)  # (T, 12, K)
        full_t = _composite_cm(
            win,
            binning.tile_counts,
            jax.lax.stop_gradient(origins),
            bg,
            (th, tw),
            settings.resolve_chunk(),
            interpret,
            settings.resolve_sub(),
        )  # (T, 5, P) = [img rgb, depth, mask]

    full = (
        full_t.reshape(ny_local, nx, 5, th, tw)
        .transpose(0, 3, 1, 4, 2)
        .reshape(ny_local * th, nx * tw, 5)
    )
    dropped = jnp.stack([binning.n_dropped_pairs, binning.n_truncated])
    return full[:, :W], dropped  # (rows_per_dev, W, 5), (2,) int32 [pairs, trunc]


def _finalize(full: jnp.ndarray, bg: jnp.ndarray, screen) -> Dict[str, jnp.ndarray]:
    return {
        "img": full[..., 0:3],
        "depth": full[..., 3],
        "mask": full[..., 4],
        "mean2d": screen.mean2d,
        "radius": screen.radius,
        "is_vis": screen.radius > 0,
    }


def rasterize_in_context(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    rgbs: jnp.ndarray,
    live: jnp.ndarray,
    cam: Camera,
    img_shape: Tuple[int, int],
    bg: jnp.ndarray,
    axis: str,
    axis_size: int,
    settings: RasterizeSettings,
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Row-band-sharded render for callers already inside a ``shard_map``
    over ``axis`` (Gaussians replicated across it). Returns the FULL image
    dict on every chip (bands exchanged with one tiled ``all_gather``).
    """
    H, W = int(img_shape[0]), int(img_shape[1])
    th = settings.tile_h
    Hp = _round_up(H, th * axis_size)
    rows_per_dev = Hp // axis_size

    screen = project_gaussians(
        means3d, scales, quats, opacities, rgbs, live, cam, (H, W), mean2d_offset
    )
    band, dropped = _render_band(
        screen.params, screen.color, screen.mean2d, screen.radius,
        screen.depth, screen.in_frustum, axis, rows_per_dev, W, settings,
        bg, extent=screen.extent,
    )
    full = jax.lax.all_gather(band, axis, axis=0, tiled=True)[:H]
    out = _finalize(full, bg, screen)
    dropped = jax.lax.psum(dropped, axis)
    out["n_dropped"] = dropped[0] + dropped[1]
    out["n_dropped_pairs"] = dropped[0]
    out["n_truncated"] = dropped[1]
    return out


def _exchange_to_bands(
    payload: jnp.ndarray,
    y: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    axis: str,
    D: int,
    rows_per_dev: int,
    cap: int,
    depth: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Route each local Gaussian's payload row to every row band it touches.

    payload (n_loc, C): differentiable per-Gaussian rows; y/radius/visible
    (n_loc,): band targeting (consumed under stop_gradient). Returns the
    (D*cap, C) rows received by THIS chip's band, their validity mask, and
    this chip's dropped-pair count (0 unless a (src, dst) bucket overflows
    ``cap``). The compaction scatter hits unique slots, so its transpose is
    a pure gather; ``all_to_all`` is its own transpose — parameter
    cotangents flow back to each Gaussian's owner with no extra psum.

    ``depth`` (n_loc,): when given, locals are processed in ascending-depth
    order so bucket overflow drops the DEEPEST extra pairs (the ones the
    compositor would have weighted least); without it overflow drops in
    input-array order. Overflow is transient either way — the train loop's
    governor doubles ``cap`` on sustained overflow.
    """
    if depth is not None:
        # stable ascending-depth permutation; invisible rows sort last so
        # they never displace a live pair's slot
        dkey = jnp.where(visible, jax.lax.stop_gradient(depth), jnp.inf)
        perm = jnp.argsort(dkey, stable=True)
        payload = payload[perm]
        y, radius, visible = y[perm], radius[perm], visible[perm]
    n_loc, C = payload.shape
    y = jax.lax.stop_gradient(y)
    r = jax.lax.stop_gradient(radius)
    scale = 1.0 / float(rows_per_dev)
    b_lo = jnp.clip(jnp.floor((y - r) * scale), 0, D - 1).astype(jnp.int32)
    b_hi = jnp.clip(jnp.floor((y + r) * scale), 0, D - 1).astype(jnp.int32)
    d_ids = jnp.arange(D, dtype=jnp.int32)[None, :]
    hit = visible[:, None] & (d_ids >= b_lo[:, None]) & (d_ids <= b_hi[:, None])
    slots = jnp.cumsum(hit.astype(jnp.int32), axis=0) - 1  # per-dst bucket slot
    ok = hit & (slots < cap)
    overflow = jnp.sum(hit.astype(jnp.int32)) - jnp.sum(ok.astype(jnp.int32))
    flat = jnp.where(ok, d_ids * cap + slots, D * cap).reshape(-1)
    src = jnp.broadcast_to(payload[:, None, :], (n_loc, D, C)).reshape(-1, C)
    send = (
        jnp.zeros((D * cap + 1, C), payload.dtype)
        .at[flat].set(src, mode="drop", unique_indices=True)[:-1]
    )
    vsend = (
        jnp.zeros((D * cap + 1,), bool)
        .at[flat].set(True, mode="drop", unique_indices=True)[:-1]
    )
    recv = jax.lax.all_to_all(
        send.reshape(D, cap, C), axis, split_axis=0, concat_axis=0
    ).reshape(D * cap, C)
    vrecv = jax.lax.all_to_all(
        vsend.reshape(D, cap), axis, split_axis=0, concat_axis=0
    ).reshape(D * cap)
    return recv, vrecv, overflow


def rasterize_gaussian_sharded(
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
    cap: int = 0,
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Row-band-sharded render with the GAUSSIANS sharded too.

    Unlike ``rasterize_sharded`` (every chip projects and bins all N), each
    chip owns N/D Gaussians end-to-end: it projects them, computes which row
    bands they touch, and one ``all_to_all`` delivers each survivor to its
    band owner(s). Per-chip projection/binning/compositing work and memory
    scale as N/D · band-overlap.

    ``cap`` bounds each (src chip → dst band) bucket; 0 auto-sizes to
    4·ceil(N/D²) (≥ 4x the uniform-scene expectation, 128-aligned). Overflow
    drops the DEEPEST extra pairs per bucket and is reported in the returned
    dict (``exchange_overflow``, per-chip counts) — callers should raise cap
    if it is ever nonzero. Comm volume: D·cap·15 f32 rows per chip each way
    (``exchange_bytes``).
    """
    H, W = int(img_shape[0]), int(img_shape[1])
    D = mesh.shape[axis]
    Hp = _round_up(H, settings.tile_h * D)
    rows_per_dev = Hp // D
    n = means3d.shape[0]
    pad = -n % D
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        means3d, scales, quats, opacities, rgbs = map(
            zf, (means3d, scales, quats, opacities, rgbs)
        )
        live = jnp.concatenate([live, jnp.zeros((pad,), bool)])
        if mean2d_offset is not None:
            mean2d_offset = zf(mean2d_offset)
    n_pad = n + pad
    if cap <= 0:
        cap = resolve_exchange_cap(n, D)
    cap = min(cap, n_pad // D)
    if mean2d_offset is None:
        mean2d_offset = jnp.zeros((n_pad, 2), jnp.float32)

    def shard_fn(m3, sc, qu, op, rg, lv, m2o):
        screen = project_gaussians(m3, sc, qu, op, rg, lv, cam, (H, W), m2o)
        payload = jnp.concatenate(
            [screen.params, screen.color, screen.radius[:, None],
             screen.extent], axis=1
        )
        # band targeting on the tight y half-extent (<= radius): rows beyond
        # it have alpha < 1/255, so skipping those bands is exact — fewer
        # duplicate sends for anisotropic / low-opacity Gaussians
        recv, vrecv, overflow = _exchange_to_bands(
            payload, screen.mean2d[:, 1], screen.extent[:, 1],
            screen.in_frustum, axis, D, rows_per_dev, cap,
            depth=screen.depth,
        )
        band, dropped = _render_band(
            recv[:, :8], recv[:, 8:12], recv[:, 3:5],
            jnp.where(vrecv, recv[:, 12], 0.0), recv[:, 11], vrecv,
            axis, rows_per_dev, W, settings, bg, extent=recv[:, 13:15],
        )
        return (
            band, screen.mean2d, screen.radius, screen.in_frustum,
            overflow[None], dropped[None],
        )

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=(P(axis),) * 6,
        check_vma=False,
    )
    full, mean2d, radius, in_frustum, overflow, dropped = sharded(
        means3d, scales, quats, opacities, rgbs, live, mean2d_offset
    )

    class _Screen:
        pass

    s = _Screen()
    s.mean2d = mean2d[:n]
    s.radius = radius[:n]
    out = _finalize(full[:H], bg, s)
    out["exchange_overflow"] = overflow
    out["exchange_bytes"] = jnp.float32(D * cap * 15 * 4)
    out["n_dropped"] = jnp.sum(dropped)
    out["n_dropped_pairs"] = jnp.sum(dropped[:, 0])
    out["n_truncated"] = jnp.sum(dropped[:, 1])
    return out


def rasterize_gaussian_sharded_in_context(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    rgbs: jnp.ndarray,
    live: jnp.ndarray,
    cam: Camera,
    img_shape: Tuple[int, int],
    bg: jnp.ndarray,
    axis: str,
    axis_size: int,
    settings: RasterizeSettings,
    cap: int = 0,
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Gaussian-sharded render for callers ALREADY inside a ``shard_map``
    over ``axis`` with the Gaussian arrays replicated (the training step's
    situation: the model MLPs emit the full set on every chip).

    Each chip takes its own N/D row slice, projects and band-targets only
    that slice, and the ``_exchange_to_bands`` all_to_all delivers survivors
    to their band owners — per-chip projection + binning + compositing work
    is N/D·overlap instead of N, unlike ``rasterize_in_context`` which
    re-projects and re-bins all N on every chip. The slice's autodiff
    transpose pads each chip's parameter cotangent with zeros outside its
    slice; the caller's gradient ``psum`` over the axis (which combined
    data x tile training already does) reassembles the full gradient with no
    extra collectives. Densification stats (mean2d / radius / is_vis) are
    all_gathered back to full length so the returned dict is
    consumer-identical to the replicated path.
    """
    H, W = int(img_shape[0]), int(img_shape[1])
    D = axis_size
    Hp = _round_up(H, settings.tile_h * D)
    rows_per_dev = Hp // D
    n = means3d.shape[0]
    pad = -n % D
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        means3d, scales, quats, opacities, rgbs = map(
            zf, (means3d, scales, quats, opacities, rgbs)
        )
        live = jnp.concatenate([live, jnp.zeros((pad,), bool)])
        if mean2d_offset is not None:
            mean2d_offset = zf(mean2d_offset)
    n_pad = n + pad
    n_loc = n_pad // D
    if cap <= 0:
        cap = resolve_exchange_cap(n, D)
    cap = min(cap, n_loc)
    if mean2d_offset is None:
        mean2d_offset = jnp.zeros((n_pad, 2), jnp.float32)

    d = jax.lax.axis_index(axis)
    start = d * n_loc
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, n_loc, axis=0)

    screen = project_gaussians(
        sl(means3d), sl(scales), sl(quats), sl(opacities), sl(rgbs),
        sl(live), cam, (H, W), sl(mean2d_offset),
    )
    payload = jnp.concatenate(
        [screen.params, screen.color, screen.radius[:, None], screen.extent],
        axis=1,
    )
    recv, vrecv, overflow = _exchange_to_bands(
        payload, screen.mean2d[:, 1], screen.extent[:, 1],
        screen.in_frustum, axis, D, rows_per_dev, cap,
        depth=screen.depth,
    )
    band, dropped = _render_band(
        recv[:, :8], recv[:, 8:12], recv[:, 3:5],
        jnp.where(vrecv, recv[:, 12], 0.0), recv[:, 11], vrecv,
        axis, rows_per_dev, W, settings, bg, extent=recv[:, 13:15],
    )
    full = jax.lax.all_gather(band, axis, axis=0, tiled=True)[:H]

    # stats back to full length (replicated, like rasterize_in_context)
    class _Screen:
        pass

    s = _Screen()
    s.mean2d = jax.lax.all_gather(screen.mean2d, axis, axis=0, tiled=True)[:n]
    s.radius = jax.lax.all_gather(screen.radius, axis, axis=0, tiled=True)[:n]
    out = _finalize(full, bg, s)
    dropped = jax.lax.psum(dropped, axis)
    overflow = jax.lax.psum(overflow, axis)
    out["n_dropped"] = dropped[0] + dropped[1] + overflow
    out["n_dropped_pairs"] = dropped[0]
    out["n_truncated"] = dropped[1]
    out["exchange_overflow"] = overflow
    out["exchange_bytes"] = jnp.float32(D * cap * 15 * 4)
    return out


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
    D = mesh.shape[axis]
    Hp = _round_up(H, settings.tile_h * D)
    rows_per_dev = Hp // D

    screen = project_gaussians(
        means3d, scales, quats, opacities, rgbs, live, cam, (H, W), mean2d_offset
    )

    def shard_fn(params, color, mean2d, radius, depth, visible, extent):
        band, dropped = _render_band(
            params, color, mean2d, radius, depth, visible,
            axis, rows_per_dev, W, settings, bg, extent=extent,
        )
        return band, dropped[None]

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    full, dropped = sharded(
        screen.params, screen.color, screen.mean2d, screen.radius,
        screen.depth, screen.in_frustum, screen.extent,
    )  # (Hp, W, 5), (D, 2)
    out = _finalize(full[:H], bg, screen)
    out["n_dropped"] = jnp.sum(dropped)
    out["n_dropped_pairs"] = jnp.sum(dropped[:, 0])
    out["n_truncated"] = jnp.sum(dropped[:, 1])
    return out
