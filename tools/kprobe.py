"""Focused TPU probe: composite fwd/bwd kernels exactly as api.rasterize
calls them (v1 + in-kernel localize, bench.py scene/sizes), plus the
surrounding memory stages. Cheaper to compile than stage_bench."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--tile_h", type=int, default=8)
    ap.add_argument("--tile_w", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--stages", default="all",
                    help="comma list: bin,gather,fwd,bwd,scatter,all")
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    want = lambda s: "all" in stages or s in stages

    print(f"backend: {jax.default_backend()}")
    from exavatar_release_tpu.core.camera import Camera
    from exavatar_release_tpu.ops.rasterizer import pallas_kernels as PK
    from exavatar_release_tpu.ops.rasterizer import preprocess as PP
    from exavatar_release_tpu.ops.rasterizer.binning import (
        bin_gaussians_compact, tile_grid)

    H, W = 1088, 1920
    n = args.n
    th, tw, chunk = args.tile_h, args.tile_w, args.chunk
    ny, nx = tile_grid((H, W), th, tw)

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

    p = jax.jit(lambda: PP.project_gaussians(
        means, scales, quats, opac, rgbs, live, cam, (H, W)))()
    jax.block_until_ready(p)

    binf = jax.jit(lambda m2, r, d, v: bin_gaussians_compact(
        m2, r, d, v, (H, W), th, tw, 1024))
    bn = binf(p.mean2d, p.radius, p.depth, p.in_frustum)
    counts = np.asarray(bn.tile_counts)
    kmax = int(counts.max())
    K = max(256, -(-(kmax + 64) // 128) * 128)
    print(f"tiles={ny*nx} pairs={counts.sum()} max/tile={kmax} "
          f"mean/tile={counts.mean():.1f} -> K={K}")
    binf = jax.jit(lambda m2, r, d, v: bin_gaussians_compact(
        m2, r, d, v, (H, W), th, tw, K))
    bn = binf(p.mean2d, p.radius, p.depth, p.in_frustum)
    if want("bin"):
        print(f"binning: {timeit(binf, p.mean2d, p.radius, p.depth, p.in_frustum, iters=args.iters):8.2f} ms")

    rows = jnp.concatenate([p.params, p.color], axis=1)
    sentinel = jnp.zeros((1, 12), jnp.float32).at[0, 5].set(-1e9)
    g12 = jax.jit(lambda r, o, ti: jnp.concatenate(
        [r[o], sentinel], axis=0)[ti])
    tr = g12(rows, bn.order, bn.tile_indices)
    if want("gather"):
        print(f"gather 12ch: {timeit(g12, rows, bn.order, bn.tile_indices, iters=args.iters):8.2f} ms")
    tp, tc = tr[..., :8], tr[..., 8:]

    t_ids = jnp.arange(ny * nx, dtype=jnp.int32)
    origins = jnp.stack([(t_ids % nx) * tw, (t_ids // nx) * th],
                        axis=1).astype(jnp.float32)

    cf = jax.jit(lambda a, b, c: PK.composite_tiles_fwd(
        a, b, c, (th, tw), chunk, False, tile_origins=origins))
    acc, tf = cf(tp, tc, bn.tile_counts)
    if want("fwd"):
        print(f"composite fwd (localize): {timeit(cf, tp, tc, bn.tile_counts, iters=args.iters):8.2f} ms")

    gacc = jnp.ones_like(acc)
    gtf = jnp.ones_like(tf)
    cb = jax.jit(lambda a, b, c, d, e, f, g: PK.composite_tiles_bwd(
        a, b, c, d, e, f, g, (th, tw), chunk, False, tile_origins=origins))
    dq, dc = cb(tp, tc, bn.tile_counts, gacc, gtf, acc, tf)
    if want("bwd"):
        print(f"composite bwd (localize): {timeit(cb, tp, tc, bn.tile_counts, gacc, gtf, acc, tf, iters=args.iters):8.2f} ms")

    if want("scatter"):
        dd = jnp.concatenate([dq, dc], axis=-1)
        s12 = jax.jit(lambda u, ti: jnp.zeros(
            (n + 1, 12), jnp.float32).at[ti].add(u)[:-1])
        s12(dd, bn.tile_indices)
        print(f"scatter 12ch: {timeit(s12, dd, bn.tile_indices, iters=args.iters):8.2f} ms")

    if want("assembly"):
        bgc = jnp.zeros(3)

        def assemble(acc_, tf_):
            rgb_tiles = acc_[..., 0:3] + tf_ * bgc[None, None, :]
            full = jnp.concatenate(
                [rgb_tiles, acc_[..., 3:4], 1.0 - tf_], axis=-1)
            full = full.reshape(ny, nx, th, tw, 5)
            full = full.transpose(0, 2, 1, 3, 4).reshape(ny * th, nx * tw, 5)
            return jnp.sum(full[:H, :W] ** 2)

        asm = jax.jit(jax.grad(assemble, argnums=(0, 1)))
        asm(acc, tf)
        print(f"assembly fwd+vjp: {timeit(asm, acc, tf, iters=args.iters):8.2f} ms")

    if want("project"):
        def proj_loss(m, s, q, o, c):
            pr = PP.project_gaussians(m, s, q, o, c, live, cam, (H, W))
            return jnp.sum(pr.params) + jnp.sum(pr.color) + jnp.sum(pr.mean2d)

        pj = jax.jit(jax.grad(proj_loss, argnums=(0, 1, 2, 3, 4)))
        pj(means, scales, quats, opac, rgbs)
        print(f"project fwd+vjp: {timeit(pj, means, scales, quats, opac, rgbs, iters=args.iters):8.2f} ms")


if __name__ == "__main__":
    main()
