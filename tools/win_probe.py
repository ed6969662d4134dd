"""Probe: per-tile window build as Pallas dynamic-offset DMA vs XLA gather.

tile_indices[t, k] = rank_sorted[starts[t] + k] masked by count — contiguous
slices at dynamic offsets, which the XLA gather engine runs at ~120M rows/s
(17.4 ms at 1080p sizes). A per-tile DMA should be ~T copy latencies.
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_kernel(starts_ref, rank_hbm, out_ref, scratch, sem, *, K, n):
    t = pl.program_id(0)
    s0 = starts_ref[t]
    cnt = starts_ref[t + 1] - s0
    # 1-D dynamic-offset copy from HBM (2-D lane-dim offsets crash the
    # Mosaic compiler on v5e; 1-D goes through the generic DMA path)
    dma = pltpu.make_async_copy(rank_hbm.at[pl.ds(s0, K)], scratch, sem)
    dma.start()
    dma.wait()
    k = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    out_ref[0] = jnp.where(k < cnt, scratch[:].reshape(1, K), n)


@functools.partial(jax.jit, static_argnames=("K", "n", "interpret"))
def windows_dma(starts, rank_pad2, K, n, interpret=False):
    """starts (T+1,) int32; rank_pad2 (1, Pm+K) int32 (sentinel-padded)."""
    T = starts.shape[0] - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, K), lambda t, s: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(_win_kernel, K=K, n=n)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, K), jnp.int32),
        interpret=interpret,
    )(starts.astype(jnp.int32), rank_pad2.reshape(-1))
    return out.reshape(T, K)


def windows_xla(starts, rank_pad, K, n):
    Pm = rank_pad.shape[0] - 1
    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    idx = starts[:-1, None] + k
    cnts = starts[1:] - starts[:-1]
    gathered = rank_pad[jnp.clip(idx, 0, Pm)]
    return jnp.where(k < cnts[:, None], gathered, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    interp = jax.default_backend() != "tpu"
    n, T, K, Pm = 100_000, 2040, 1024, 1_600_000
    rng = np.random.default_rng(0)
    starts = np.sort(rng.integers(0, Pm, (T + 1,)).astype(np.int32))
    starts[0], starts[-1] = 0, Pm
    # cap window widths at K like real counts do
    rank = rng.integers(0, n, (Pm,)).astype(np.int32)
    starts_j = jnp.asarray(starts)
    rank_pad = jnp.concatenate([jnp.asarray(rank), jnp.full((1,), n, jnp.int32)])
    rank_pad2 = jnp.concatenate(
        [jnp.asarray(rank), jnp.full((K,), n, jnp.int32)]
    ).reshape(1, -1)

    ref = windows_xla(starts_j, rank_pad, K, n)
    out = windows_dma(starts_j, rank_pad2, K, n, interp)
    # windows longer than K clip identically in both
    match = bool((ref == out).all())
    print("parity:", match)

    f_x = jax.jit(lambda s, r: windows_xla(s, r, K, n))
    f_d = jax.jit(lambda s, r: windows_dma(s, r, K, n, interp))
    for name, f, a in (("xla", f_x, rank_pad), ("dma", f_d, rank_pad2)):
        o = f(starts_j, a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f(starts_j, a)
        jax.block_until_ready(o)
        print(f"windows {name}: {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
