"""Profiling: jax.profiler traces + roofline estimates for the hot kernels.

New capability vs the reference (which only has a wall-clock Timer,
reference avatar/common/timer.py:10-38; SURVEY.md §5 calls out
jax.profiler traces + per-kernel roofline counters as new work).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof). No-op
    when ``log_dir`` is None so call sites can stay unconditional."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def composite_roofline(
    img_shape, tile_h: int, tile_w: int, max_per_tile: int, chunk: int,
    peak_flops: float = 2.0e14, peak_bw: float = 8.0e11,
) -> Dict[str, float]:
    """Analytic FLOP/byte model of the tile-compositing kernel (one forward):

    * per tile-chunk: the (P, 8)@(8, G) density matmul, the (P, G)@(G, G)
      triangular prefix matmuls (x2), and the (P, G)@(G, 4) color matmul;
    * HBM traffic: tile_quad + tile_color in, accum + tfinal out.

    Returns flops, bytes, and the compute/bandwidth-bound time estimates —
    the speed-of-light targets bench.py compares against.
    """
    H, W = img_shape
    ny = -(-H // tile_h)
    nx = -(-W // tile_w)
    tiles = ny * nx
    P = tile_h * tile_w
    n_chunks = -(-max_per_tile // chunk)
    per_chunk_flops = 2 * P * 8 * chunk + 2 * 2 * P * chunk * chunk + 2 * P * chunk * 4
    flops = tiles * n_chunks * per_chunk_flops
    bytes_moved = tiles * (max_per_tile * (8 + 4) * 4 + P * 5 * 4)
    return {
        "flops": float(flops),
        "bytes": float(bytes_moved),
        "t_compute": flops / peak_flops,
        "t_memory": bytes_moved / peak_bw,
        "sol_time": max(flops / peak_flops, bytes_moved / peak_bw),
    }


class StepRater:
    """Rolling steps/s + pixels/s meter for train loops."""

    def __init__(self, pixels_per_step: int, window: int = 50):
        self.pixels = pixels_per_step
        self.window = window
        self.times = []

    def tick(self) -> Optional[Dict[str, float]]:
        self.times.append(time.perf_counter())
        if len(self.times) > self.window:
            self.times.pop(0)
        if len(self.times) < 2:
            return None
        dt = (self.times[-1] - self.times[0]) / (len(self.times) - 1)
        return {"steps_per_s": 1.0 / dt, "rays_per_s": self.pixels / dt}
