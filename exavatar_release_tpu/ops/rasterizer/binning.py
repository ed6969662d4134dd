"""Tile binning: assigning depth-ordered Gaussians to image tiles.

Two interchangeable algorithms with identical outputs:

* ``bin_gaussians_sorted`` (default): the TPU-native analog of the CUDA
  pair-sort — each Gaussian emits up to E (tile, depth-rank) pairs over its
  screen rectangle; ONE multi-key ``lax.sort`` orders all pairs
  (tile-major, depth-minor); per-tile windows come from a searchsorted over
  the sorted tile keys. O(N·E log(N·E)) — measured ~25x faster than the
  scan at 1080p/100k Gaussians on v5e (binning dominated the frame).
* ``bin_gaussians_scan``: per-tile masked compaction of the global
  depth-argsorted list (O(T × N)); simple, serves as the oracle.

Restricted to any tile, a globally depth-sorted list gives exactly the
per-tile depth order the CUDA sorter produces, so compositing order matches
the reference. Everything is static-shape: each tile holds at most
``max_per_tile`` indices; a Gaussian spanning more than ``max_tiles_per_gaussian``
tiles keeps the top-left portion of its rect (the screen-size prune bounds
radii during training, so the cap binds rarely — raise it if needed).
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
    # pair-sort byproducts powering the scatter-free gather backward
    # (None from the scan algorithm):
    pair_slot: object = None  # (N, E) int32 — sorted position of each pair
    pair_tile: object = None  # (N*E,) int32 — tile id per sorted pair
    starts: object = None  # (T+1,) int32 — window starts per tile
    pair_valid: object = None  # (N, E) bool
    # pairs silently lost to static capacities — () int32 scalars; consumers
    # (the train loop) must surface nonzero values, never swallow them:
    n_dropped_pairs: object = None  # pair-budget (max_pairs / E-cap) drops
    n_truncated: object = None  # per-tile max_per_tile truncation drops


def tile_grid(img_shape: Tuple[int, int], tile_h: int, tile_w: int) -> Tuple[int, int]:
    H, W = img_shape
    return (-(-H // tile_h), -(-W // tile_w))


@functools.partial(
    jax.jit, static_argnames=("img_shape", "tile_h", "tile_w", "max_per_tile")
)
def bin_gaussians_scan(
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


def _tile_rect(m2d, rad, tile_h, tile_w, ny, nx, extent=None,
               tile_row_offset=0):
    """CUDA getRect: [lo, hi) tile rectangle covered by each Gaussian.

    ``extent`` (N, 2), when given, replaces the CUDA bounding circle with
    the tight per-axis AABB of the alpha >= 1/255 ellipse
    (preprocess.ScreenGaussians.extent) — pairs outside it would be zeroed
    by the kernel's alpha cutoff anyway, so this is exact, just cheaper.

    ``tile_row_offset`` (traced int/scalar): viewport = global tile rows
    [offset, offset + ny). The floors run on GLOBAL pixel coords and the
    offset is subtracted in (exact) tile-index space — shifting mean2d by
    the band origin in f32 BEFORE the floor rounds differently near tile
    boundaries and flips marginal pairs, which broke sharded-vs-single
    bit-parity at 512x896/100k."""
    rx = rad if extent is None else extent[:, 0]
    ry = rad if extent is None else extent[:, 1]
    off = jnp.float32(tile_row_offset)
    x_lo = jnp.clip(jnp.floor((m2d[:, 0] - rx) / tile_w), 0, nx).astype(jnp.int32)
    x_hi = jnp.clip(
        jnp.floor((m2d[:, 0] + rx + tile_w - 1) / tile_w), 0, nx
    ).astype(jnp.int32)
    y_lo = jnp.clip(
        jnp.floor((m2d[:, 1] - ry) / tile_h) - off, 0, ny
    ).astype(jnp.int32)
    y_hi = jnp.clip(
        jnp.floor((m2d[:, 1] + ry + tile_h - 1) / tile_h) - off, 0, ny
    ).astype(jnp.int32)
    return x_lo, x_hi, y_lo, y_hi


@functools.partial(
    jax.jit,
    static_argnames=(
        "img_shape", "tile_h", "tile_w", "max_per_tile", "max_tiles_per_gaussian"
    ),
)
def bin_gaussians_sorted(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,
    visible: jnp.ndarray,
    img_shape: Tuple[int, int],
    tile_h: int = 8,
    tile_w: int = 128,
    max_per_tile: int = 1024,
    max_tiles_per_gaussian: int = 64,
    extent: jnp.ndarray = None,
    tile_row_offset=0,
) -> TileBinning:
    """Pair-sort binning (see module docstring). ``extent`` (N, 2): tight
    per-axis AABBs replacing the bounding circle; ``tile_row_offset``:
    viewport starts at that GLOBAL tile row (see _tile_rect)."""
    n = mean2d.shape[0]
    ny, nx = tile_grid(img_shape, tile_h, tile_w)
    num_tiles = ny * nx
    E = max_tiles_per_gaussian

    # global front-to-back order and its inverse (depth rank per Gaussian)
    sort_key = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)

    m2d = mean2d[order]
    rad = radius[order]
    vis = visible[order] & (rad > 0)
    ext = None if extent is None else extent[order]
    x_lo, x_hi, y_lo, y_hi = _tile_rect(
        m2d, rad, tile_h, tile_w, ny, nx, ext, tile_row_offset
    )
    w = x_hi - x_lo  # rect width in tiles
    span = w * (y_hi - y_lo)

    # e-th covered tile (row-major within the rect), invalid -> sentinel tile
    e = jnp.arange(E, dtype=jnp.int32)[None, :]  # (1, E)
    safe_w = jnp.maximum(w, 1)[:, None]
    ty = y_lo[:, None] + e // safe_w
    tx = x_lo[:, None] + e % safe_w
    tile_e = ty * nx + tx  # (N, E)
    valid = vis[:, None] & (e < span[:, None])
    tile_e = jnp.where(valid, tile_e, num_tiles)

    # Sort pairs by tile ONLY: the pre-sort layout is row-major (n, E) with
    # row = depth rank, so pair order is already non-decreasing in rank, and
    # lax.sort is STABLE -> within every tile the depth order is preserved.
    # This halves the comparator (1 key vs lexicographic 2) and drops a whole
    # (n*E,) operand vs sorting (tile, rank, iota) with num_keys=2.
    tile_flat = tile_e.reshape(-1)
    iota = jnp.arange(n * E, dtype=jnp.int32)
    tile_sorted, perm = jax.lax.sort_key_val(tile_flat, iota)
    # depth rank of each sorted pair = original row = perm // E
    rank_sorted = jax.lax.div(perm, jnp.int32(E))
    # inverse permutation: sorted position of each original (rank, e) pair
    pair_slot = (
        jnp.zeros((n * E,), jnp.int32).at[perm].set(iota).reshape(n, E)
    )

    # per-tile windows
    starts = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]  # (T,)

    k = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    idx = starts[:-1, None] + k  # (T, K)
    in_tile = k < counts[:, None]
    rank_pad = jnp.concatenate([rank_sorted, jnp.array([n], jnp.int32)])
    gathered = rank_pad[jnp.clip(idx, 0, rank_sorted.shape[0])]
    tile_indices = jnp.where(in_tile, gathered, n)

    return TileBinning(
        order=order,
        tile_indices=tile_indices,
        tile_counts=counts,
        num_tiles=(ny, nx),
        pair_slot=pair_slot,
        pair_tile=tile_sorted,
        starts=starts,
        pair_valid=valid,
        n_dropped_pairs=jnp.sum(
            jnp.where(vis, jnp.maximum(span - E, 0), 0)
        ),
        n_truncated=jnp.sum(jnp.maximum(counts - max_per_tile, 0)),
    )


def _compact_sorted_pairs(
    mean2d, radius, depth, visible, img_shape, tile_h, tile_w, max_pairs,
    extent, tile_row_offset=0,
):
    """Shared core of the compact/ragged binnings: emit each Gaussian's
    pairs contiguously at exclusive-cumsum offsets inside a (max_pairs,)
    budget, then one single-key stable tile sort. Returns
    (order, tile_sorted, rank_sorted, starts, counts, total_pairs, ny, nx)
    with depth order preserved within every tile."""
    n = mean2d.shape[0]
    ny, nx = tile_grid(img_shape, tile_h, tile_w)
    num_tiles = ny * nx
    Pm = max_pairs

    sort_key = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)

    m2d = mean2d[order]
    rad = radius[order]
    vis = visible[order] & (rad > 0)
    ext = None if extent is None else extent[order]
    x_lo, x_hi, y_lo, y_hi = _tile_rect(
        m2d, rad, tile_h, tile_w, ny, nx, ext, tile_row_offset
    )
    w = x_hi - x_lo
    span = jnp.where(vis, w * (y_hi - y_lo), 0)

    offsets = jnp.cumsum(span) - span  # exclusive

    # Segment expansion with ZERO per-slot gathers: scatter per-Gaussian
    # values at each segment's first slot and forward-fill. cummax IS
    # fill-forward whenever the scattered sequence is non-decreasing in j —
    # true for offsets/ends directly, and forced for the rect fields by
    # packing them under the strictly-increasing rank in the high bits.
    bw_rank = max(int(n).bit_length(), 1)
    bw_rect = int(nx).bit_length() + int(ny).bit_length()
    bw_w = int(nx + 1).bit_length()
    assert bw_rank + max(bw_rect, bw_w) <= 31, (n, ny, nx)
    rank = jnp.arange(n, dtype=jnp.int32)
    pack_a = (rank << bw_rect) | (x_lo << int(ny).bit_length()) | y_lo
    pack_b = (rank << bw_w) | w

    starts_at = jnp.where(span > 0, offsets, Pm)  # empty/overflow -> dropped

    def fill(vals, init):
        buf = jnp.full((Pm,), init, jnp.int32).at[starts_at].max(
            vals, mode="drop"
        )
        return jax.lax.cummax(buf)

    a = fill(pack_a, -1)
    b = fill(pack_b, -1)
    off_f = fill(offsets, 0)
    end_f = fill(offsets + span, 0)

    g_ok = a >= 0
    g = jnp.where(g_ok, a >> bw_rect, 0)
    xlo_s = (a >> int(ny).bit_length()) & ((1 << int(nx).bit_length()) - 1)
    ylo_s = a & ((1 << int(ny).bit_length()) - 1)
    w_s = jnp.maximum(b & ((1 << bw_w) - 1), 1)

    j = jnp.arange(Pm, dtype=jnp.int32)
    e = j - off_f
    valid = g_ok & (j < end_f)

    ty = ylo_s + e // w_s
    tx = xlo_s + e % w_s
    tile = jnp.where(valid, ty * nx + tx, num_tiles)

    # single-key stable sort; depth rank rides along as the value operand
    tile_sorted, rank_sorted = jax.lax.sort(
        (tile, jnp.where(valid, g, n)), num_keys=1
    )

    starts = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    total_pairs = offsets[-1] + span[-1]
    return order, tile_sorted, rank_sorted, starts, counts, total_pairs, ny, nx


@functools.partial(
    jax.jit,
    static_argnames=(
        "img_shape", "tile_h", "tile_w", "max_per_tile", "max_pairs"
    ),
)
def bin_gaussians_compact(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,
    visible: jnp.ndarray,
    img_shape: Tuple[int, int],
    tile_h: int = 8,
    tile_w: int = 128,
    max_per_tile: int = 1024,
    max_pairs: int = 0,
    extent: jnp.ndarray = None,
) -> TileBinning:
    """Compact pair-list binning: sort ONLY a (max_pairs,) budget.

    ``bin_gaussians_sorted`` sorts a dense (N, E) pair expansion — at
    1080p/100k that is 6.4M slots for ~1.2M live pairs, and the sort
    dominates the frame (~73 ms of ~250 on v5e). Here each Gaussian's pairs
    are emitted CONTIGUOUSLY at exclusive-cumsum offsets, so the sort (and
    every later per-pair op) runs on a snug static budget:

      * segment ids via the scatter-ones + cumsum expansion trick (no
        searchsorted over N, no (N, E) materialisation);
      * depth rank rides the single-key stable tile sort as a value operand
        — no iota / inverse permutation needed.

    ``max_pairs`` <= 0 means 16·N. If the scene overflows the budget the
    DEEPEST Gaussians' pairs are dropped first (emission is depth-ordered),
    which degrades gracefully. Does not populate the pair_slot/... fields
    (tile_gather's backward needs the dense layout).
    """
    n = mean2d.shape[0]
    if max_pairs <= 0:
        # pairs per Gaussian shrink with tile area: ~12/N at 8x128 tiles,
        # ~4/N at 32x128 (1080p, radius<=~20 px after screen-size pruning).
        # The sort and every per-pair op run on this budget; overflow drops
        # the DEEPEST pairs and is reported via n_dropped_pairs.
        max_pairs = n * max(6, 128 // tile_h)
    Pm = max_pairs
    (order, tile_sorted, rank_sorted, starts, counts, total_pairs,
     ny, nx) = _compact_sorted_pairs(
        mean2d, radius, depth, visible, img_shape, tile_h, tile_w, Pm, extent
    )

    k = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    idx = starts[:-1, None] + k
    in_tile = k < counts[:, None]
    rank_pad = jnp.concatenate([rank_sorted, jnp.array([n], jnp.int32)])
    gathered = rank_pad[jnp.clip(idx, 0, Pm)]
    tile_indices = jnp.where(in_tile, gathered, n)

    return TileBinning(
        order=order,
        tile_indices=tile_indices,
        tile_counts=counts,
        num_tiles=(ny, nx),
        n_dropped_pairs=jnp.maximum(total_pairs - Pm, 0),
        n_truncated=jnp.sum(jnp.maximum(counts - max_per_tile, 0)),
    )


class RaggedBinning(NamedTuple):
    """Chunk-aligned pair-major binning for the ragged compositing kernels
    (pallas_kernels.composite_pairs_*_rg). No per-tile capacity exists —
    the only cap is the global pair budget."""

    order: jnp.ndarray  # (N,) depth sort
    pair_rank: jnp.ndarray  # (Pa,) int32 depth-rank per aligned slot; N = pad
    tid: jnp.ndarray  # (NC,) int32 tile id per chunk slot
    flags: jnp.ndarray  # (NC,) int32 bit0 first / bit1 last / bit2 valid
    tile_counts: jnp.ndarray  # (T,)
    num_tiles: Tuple[int, int]
    n_dropped_pairs: jnp.ndarray  # () int32
    n_truncated: jnp.ndarray  # () int32 — always 0 (kept for API parity)


@functools.partial(
    jax.jit,
    static_argnames=("img_shape", "tile_h", "tile_w", "chunk", "max_pairs"),
)
def bin_gaussians_ragged(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,
    visible: jnp.ndarray,
    img_shape: Tuple[int, int],
    tile_h: int = 32,
    tile_w: int = 128,
    chunk: int = 256,
    max_pairs: int = 0,
    extent: jnp.ndarray = None,
    tile_row_offset=0,
) -> RaggedBinning:
    """Pair-major binning: the sorted pair list is re-scattered so every
    tile's window starts on a ``chunk`` boundary (one scatter; the aligned
    capacity is max_pairs + T·chunk), plus per-chunk-slot metadata (tile
    id, first/last/valid flags) that scalar-prefetch drives the ragged
    kernels' output-block revisit pattern with. Every tile owns >= 1 slot
    so empty tiles still emit background. There is NO max_per_tile and no
    truncation — per-tile occupancy is bounded only by the global budget
    (the TPU analog of the CUDA rasterizer's dynamic ranges buffer)."""
    n = mean2d.shape[0]
    if max_pairs <= 0:
        max_pairs = n * max(6, 128 // tile_h)
    Pm = -(-max_pairs // chunk) * chunk
    (order, tile_sorted, rank_sorted, starts, counts, total_pairs,
     ny, nx) = _compact_sorted_pairs(
        mean2d, radius, depth, visible, img_shape, tile_h, tile_w, Pm,
        extent, tile_row_offset,
    )
    num_tiles = ny * nx
    Pa = Pm + num_tiles * chunk
    NC = Pa // chunk

    nchunks = jnp.maximum(-(-counts // chunk), 1)  # (T,) >= 1
    chunk_starts = jnp.cumsum(nchunks) - nchunks
    total_chunks = chunk_starts[-1] + nchunks[-1]

    # scatter each sorted pair to its chunk-aligned slot
    j = jnp.arange(Pm, dtype=jnp.int32)
    pv = tile_sorted < num_tiles
    t_safe = jnp.where(pv, tile_sorted, 0)
    dest = jnp.where(
        pv, chunk_starts[t_safe] * chunk + (j - starts[t_safe]), Pa
    )
    pair_rank = (
        jnp.full((Pa + 1,), n, jnp.int32)
        .at[dest].set(rank_sorted, mode="drop", unique_indices=True)[:-1]
    )

    # per-chunk-slot metadata via scatter + forward-fill (chunk_starts is
    # strictly increasing since every tile owns >= 1 chunk)
    jc = jnp.arange(NC, dtype=jnp.int32)
    tid = jax.lax.cummax(
        jnp.zeros((NC,), jnp.int32).at[chunk_starts].set(
            jnp.arange(num_tiles, dtype=jnp.int32), mode="drop"
        )
    )
    first = jc == chunk_starts[tid]
    last = jc == chunk_starts[tid] + nchunks[tid] - 1
    valid = jc < total_chunks
    flags = (
        first.astype(jnp.int32)
        + 2 * (last & valid).astype(jnp.int32)
        + 4 * valid.astype(jnp.int32)
    )
    return RaggedBinning(
        order=order,
        pair_rank=pair_rank,
        tid=tid,
        flags=flags,
        tile_counts=counts,
        num_tiles=(ny, nx),
        n_dropped_pairs=jnp.maximum(total_pairs - Pm, 0),
        n_truncated=jnp.zeros((), jnp.int32),
    )


# default algorithm
bin_gaussians = bin_gaussians_sorted


@jax.custom_vjp
def tile_gather(vals_pad, tile_indices, pair_slot, pair_tile, starts, pair_valid):
    """Gather per-tile rows with a scatter-free backward.

    Forward: ``vals_pad[tile_indices]`` (vals_pad: (N+1, C) depth-sorted rows
    + sentinel; tile_indices: (T, K)). Backward: instead of XLA's serialized
    scatter-add of the (T, K, C) cotangent into N rows, every Gaussian
    gathers its own contributions through the pair-sort's inverse
    permutation and sums over its <= E pairs — pure gathers, no scatter
    (measured ~100 ms -> ~0 of the 1080p backward on v5e).
    """
    return vals_pad[tile_indices]


def _tile_gather_fwd(vals_pad, tile_indices, pair_slot, pair_tile, starts, pair_valid):
    out = vals_pad[tile_indices]
    K = tile_indices.shape[1]
    return out, (vals_pad.shape, pair_slot, pair_tile, starts, pair_valid, K)


def _tile_gather_bwd(res, cot):
    shape_pad, pair_slot, pair_tile, starts, pair_valid, K = res
    T = cot.shape[0]
    C = cot.shape[-1]
    j = pair_slot  # (N, E) sorted pair position
    t = pair_tile[j]  # (N, E) tile of each pair
    t_ok = t < T
    t_safe = jnp.where(t_ok, t, 0)
    k = j - starts[t_safe]
    ok = pair_valid & t_ok & (k >= 0) & (k < K)
    flat = cot.reshape(T * K, C)
    idx = jnp.clip(t_safe * K + k, 0, T * K - 1)
    contrib = jnp.where(ok[..., None], flat[idx], 0.0)
    dvals_rows = jnp.sum(contrib, axis=1)  # (N, C) depth-rank order
    dvals = jnp.concatenate(
        [dvals_rows, jnp.zeros((1, C), dvals_rows.dtype)], axis=0
    )
    return dvals, None, None, None, None, None


tile_gather.defvjp(_tile_gather_fwd, _tile_gather_bwd)
