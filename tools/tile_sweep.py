"""Sweep rasterizer tile shapes at bench load (full fwd+bwd step).

Pixels are flattened to P = th*tw rows inside the composite kernels, so the
MXU sees the same matmul shapes regardless of the tile aspect; what the tile
shape DOES change is the (gaussian, tile) pair count — squarer tiles cover a
round Gaussian footprint with fewer tiles, shrinking binning/sort, window
gather, composite chunks, and the scatter-add backward together.

Usage: python tools/tile_sweep.py [--iters 5] [--n 100000]
"""
import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os
    import sys
    try:
        backend = jax.default_backend()
    except RuntimeError:
        if os.environ.get("JAX_PLATFORMS"):
            os.environ["JAX_PLATFORMS"] = ""
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
    print(f"backend: {backend}", flush=True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--shapes", type=str, default="8x128,16x64,32x32")
    ap.add_argument("--chunks", type=str, default="128")
    args = ap.parse_args()

    from exavatar_release_tpu.core.camera import Camera
    from exavatar_release_tpu.ops.rasterizer.api import (
        RasterizeSettings, rasterize)

    H, W = 1088, 1920
    n = args.n
    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 6.0, (n, 1)).astype(np.float32)
    focal = 1000.0
    x = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (W / focal) * z
    y = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (H / focal) * z
    means = jnp.asarray(np.concatenate([x, y, z], 1))
    scales = jnp.asarray(
        np.exp(rng.uniform(np.log(0.01), np.log(0.05), (n, 3))).astype(np.float32))
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    live = jnp.ones((n,), bool)
    cam = Camera(R=jnp.eye(3), t=jnp.zeros(3),
                 focal=jnp.asarray([focal, focal]),
                 princpt=jnp.asarray([W / 2.0, H / 2.0]))
    bg = jnp.zeros(3)

    ref_img = None
    import itertools
    for spec, chunk in itertools.product(
            args.shapes.split(","), [int(c) for c in args.chunks.split(",")]):
        th, tw = (int(v) for v in spec.split("x"))
        settings = RasterizeSettings(
            backend="pallas", tile_h=th, tile_w=tw, max_per_tile=1024,
            chunk=chunk)
        # probe pass: occupancy -> snug K + pair budget (like bench.py)
        probe = rasterize(means, scales, quats, opac, rgbs, live, cam,
                          (H, W), bg, settings)
        counts = np.asarray(probe["tile_counts"])
        kmax = int(counts.max())
        K = min(1024, max(256, -(-(kmax + 64) // 128) * 128))
        budget = int(counts.sum() * 1.25) // 1024 * 1024 + 1024
        settings = dataclasses.replace(
            settings, max_per_tile=K, max_pairs=budget)

        img = np.asarray(probe["img"])
        if ref_img is None:
            ref_img = img
            diff = 0.0
        else:
            diff = float(np.abs(img - ref_img).max())

        def loss(means, scales, quats, opac, rgbs):
            r = rasterize(means, scales, quats, opac, rgbs, live, cam,
                          (H, W), bg, settings)
            return jnp.sum(r["img"]) + jnp.sum(r["mask"]) + jnp.sum(r["depth"])

        step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        out = step(means, scales, quats, opac, rgbs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(means, scales, quats, opac, rgbs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters

        fwd = jax.jit(loss)
        jax.block_until_ready(fwd(means, scales, quats, opac, rgbs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = fwd(means, scales, quats, opac, rgbs)
        jax.block_until_ready(o)
        dt_f = (time.perf_counter() - t0) / args.iters

        print(f"{th:3d}x{tw:<3d} c={chunk:3d} K={K:4d} pairs={counts.sum()/1e6:5.2f}M "
              f"max/tile={kmax:4d} fwd={dt_f*1e3:6.1f}ms "
              f"fwd+bwd={dt*1e3:6.1f}ms rays/s={H*W/dt/1e6:6.2f}M "
              f"img_vs_first={diff:.2e}", flush=True)


if __name__ == "__main__":
    main()
