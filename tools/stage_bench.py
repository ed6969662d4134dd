"""Per-stage timing of the 3DGS fwd+bwd pipeline at bench load.

Times each stage jitted in isolation (sizes match bench.py on TPU):
  project | binning | gather+pack | composite fwd | composite bwd | scatter bwd

Usage: python tools/stage_bench.py [--iters 10]
"""
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
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import os
    import sys
    try:
        backend = jax.default_backend()
    except RuntimeError:
        # plugin backend (tunnel) failed to init — re-exec letting jax pick
        if os.environ.get("JAX_PLATFORMS"):
            os.environ["JAX_PLATFORMS"] = ""
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
    print(f"backend: {backend}")

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--tile_h", type=int, default=32)
    ap.add_argument("--tile_w", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--skip_v2", action="store_true")
    args = ap.parse_args()

    from exavatar_release_tpu.core.camera import Camera
    from exavatar_release_tpu.ops.rasterizer import binning as B
    from exavatar_release_tpu.ops.rasterizer import pallas_kernels as PK
    from exavatar_release_tpu.ops.rasterizer import preprocess as PP

    H, W = 1088, 1920
    n = args.n
    tile_h, tile_w, K, chunk = args.tile_h, args.tile_w, 1024, args.chunk
    print(f"tile {tile_h}x{tile_w} chunk {chunk} n {n}")

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

    # ---- project ----
    proj = jax.jit(lambda m, s, q, o, c: PP.project_gaussians(
        m, s, q, o, c, live, cam, (H, W)))
    p = proj(means, scales, quats, opac, rgbs)
    print(f"project: {timeit(proj, means, scales, quats, opac, rgbs, iters=args.iters):8.2f} ms")

    # ---- binning ----
    binf = jax.jit(lambda m2, r, d, v: B.bin_gaussians_sorted(
        m2, r, d, v, (H, W), tile_h, tile_w, K))
    bn = binf(p.mean2d, p.radius, p.depth, p.in_frustum)
    print(f"binning: {timeit(binf, p.mean2d, p.radius, p.depth, p.in_frustum, iters=args.iters):8.2f} ms")
    counts = np.asarray(bn.tile_counts)
    print(f"  pairs total={counts.sum()} max/tile={counts.max()} "
          f"mean/tile={counts.mean():.1f} trunc_tiles={(counts > K).sum()}")

    binc = jax.jit(lambda m2, r, d, v: B.bin_gaussians_compact(
        m2, r, d, v, (H, W), tile_h, tile_w, K))
    bnc = binc(p.mean2d, p.radius, p.depth, p.in_frustum)
    same = bool((bnc.tile_indices == bn.tile_indices).all())
    print(f"binning compact: {timeit(binc, p.mean2d, p.radius, p.depth, p.in_frustum, iters=args.iters):8.2f} ms   (parity {same})")

    # --- attribution: raw sort + window gather at the same sizes ---
    Pm = 16 * n
    keys = jnp.asarray(rng.integers(0, 2041, (Pm,)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, n, (Pm,)).astype(np.int32))
    srt = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    srt(keys, vals)
    print(f"  raw sort {Pm/1e6:.1f}M x2: {timeit(srt, keys, vals, iters=args.iters):8.2f} ms")
    keys64 = jnp.asarray(rng.integers(0, 2041, (64*n,)).astype(np.int32))
    vals64 = jnp.asarray(rng.integers(0, n, (64*n,)).astype(np.int32))
    srt(keys64, vals64)
    print(f"  raw sort {64*n/1e6:.1f}M x2: {timeit(srt, keys64, vals64, iters=args.iters):8.2f} ms")
    T0 = bn.tile_indices.shape[0]
    stt = jnp.sort(jnp.asarray(rng.integers(0, Pm, (T0+1,)).astype(np.int32)))
    rp = jnp.asarray(rng.integers(0, n, (Pm+1,)).astype(np.int32))
    def windows(starts, rank_pad):
        k = jnp.arange(K, dtype=jnp.int32)[None, :]
        idx = starts[:-1, None] + k
        cnts = starts[1:] - starts[:-1]
        gathered = rank_pad[jnp.clip(idx, 0, Pm)]
        return jnp.where(k < cnts[:, None], gathered, n)
    wf = jax.jit(windows)
    wf(stt, rp)
    print(f"  window gather (T,K): {timeit(wf, stt, rp, iters=args.iters):8.2f} ms")

    # ---- gather+pack ----
    T = bn.tile_indices.shape[0]

    ny, nx = bn.num_tiles
    t_ids = jnp.arange(T, dtype=jnp.int32)
    origins = jnp.stack([(t_ids % nx) * tile_w, (t_ids // nx) * tile_h],
                        axis=1).astype(jnp.float32)

    def gather_pack(params, color, order, tile_indices):
        sp = jnp.zeros((1, 8), jnp.float32).at[0, 5].set(-1e9)
        qp = jnp.concatenate([params[order], sp], 0)
        cp = jnp.concatenate([color[order], jnp.zeros((1, 4), jnp.float32)], 0)
        tile_params = qp[tile_indices]
        tile_color = cp[tile_indices]
        return PP.pack_tile_quads(tile_params, origins[:, None, :]), tile_color

    gp = jax.jit(gather_pack)
    tq, tc = gp(p.params, p.color, bn.order, bn.tile_indices)
    print(f"gather+pack: {timeit(gp, p.params, p.color, bn.order, bn.tile_indices, iters=args.iters):8.2f} ms")

    # ---- composite fwd (v1 in-kernel localize = the product path) ----
    interp = jax.default_backend() != "tpu"
    sp8 = jnp.zeros((1, 8), jnp.float32).at[0, 5].set(-1e9)
    tpg = jnp.concatenate([p.params[bn.order], sp8], 0)[bn.tile_indices]
    cf = jax.jit(lambda a, b, c: PK.composite_tiles_fwd(
        a, b, c, (tile_h, tile_w), chunk, interp, tile_origins=origins))
    acc, tf = cf(tpg, tc, bn.tile_counts)
    print(f"composite fwd: {timeit(cf, tpg, tc, bn.tile_counts, iters=args.iters):8.2f} ms")

    # ---- composite bwd ----
    gacc = jnp.ones_like(acc)
    gtf = jnp.ones_like(tf)
    cb = jax.jit(lambda a, b, c, d, e, f, g: PK.composite_tiles_bwd(
        a, b, c, d, e, f, g, (tile_h, tile_w), chunk, interp,
        tile_origins=origins))
    dq, dc = cb(tpg, tc, bn.tile_counts, gacc, gtf, acc, tf)
    print(f"composite bwd: {timeit(cb, tpg, tc, bn.tile_counts, gacc, gtf, acc, tf, iters=args.iters):8.2f} ms")

    # ---- full product path: rasterize() fwd / fwd+bwd ----
    from exavatar_release_tpu.ops.rasterizer.api import (
        RasterizeSettings, rasterize)
    st = RasterizeSettings(tile_h=tile_h, tile_w=tile_w, chunk=chunk)
    bg = jnp.zeros(3)

    def full_fwd(m, s, q, o, c):
        r = rasterize(m, s, q, o, c, live, cam, (H, W), bg, settings=st)
        return r["img"], r["depth"], r["mask"]

    ff = jax.jit(full_fwd)
    jax.block_until_ready(ff(means, scales, quats, opac, rgbs))
    print(f"FULL rasterize fwd: {timeit(ff, means, scales, quats, opac, rgbs, iters=args.iters):8.2f} ms")

    def full_loss(m, s, q, o, c):
        i, d, k = full_fwd(m, s, q, o, c)
        return jnp.sum(i) + jnp.sum(d) + jnp.sum(k)

    fb = jax.jit(jax.grad(full_loss, argnums=(0, 1, 2, 3, 4)))
    jax.block_until_ready(fb(means, scales, quats, opac, rgbs))
    print(f"FULL rasterize fwd+bwd: {timeit(fb, means, scales, quats, opac, rgbs, iters=args.iters):8.2f} ms")

    if args.skip_v2:
        return

    # ---- composite v2 (occupancy-aware) ----
    cf2 = jax.jit(lambda a, b, c: PK.composite_tiles_fwd_v2(
        a, b, c, (tile_h, tile_w), chunk, interp))
    acc2, tf2 = cf2(tq, tc, bn.tile_counts)
    print(f"composite fwd v2: {timeit(cf2, tq, tc, bn.tile_counts, iters=args.iters):8.2f} ms"
          f"   (max diff {float(jnp.abs(acc2-acc).max()):.2e})")
    cb2 = jax.jit(lambda a, b, c, d, e, f, g: PK.composite_tiles_bwd_v2(
        a, b, c, d, e, f, g, (tile_h, tile_w), chunk, interp))
    out2 = cb2(tq, tc, bn.tile_counts, gacc, gtf, acc, tf)
    print(f"composite bwd v2: {timeit(cb2, tq, tc, bn.tile_counts, gacc, gtf, acc, tf, iters=args.iters):8.2f} ms")

    cf2b = jax.jit(lambda a, b, c: PK.composite_tiles_fwd_v2(
        a, b, c, (tile_h, tile_w), chunk, interp, True))
    acc2b, _ = cf2b(tq, tc, bn.tile_counts)
    print(f"composite fwd v2+bf16: {timeit(cf2b, tq, tc, bn.tile_counts, iters=args.iters):8.2f} ms"
          f"   (max diff {float(jnp.abs(acc2b-acc).max()):.2e})")
    cb2b = jax.jit(lambda a, b, c, d, e, f, g: PK.composite_tiles_bwd_v2(
        a, b, c, d, e, f, g, (tile_h, tile_w), chunk, interp, True))
    out2b = cb2b(tq, tc, bn.tile_counts, gacc, gtf, acc, tf)
    print(f"composite bwd v2+bf16: {timeit(cb2b, tq, tc, bn.tile_counts, gacc, gtf, acc, tf, iters=args.iters):8.2f} ms")

    # ---- scatter bwd (transpose of the gather) ----
    def scat(dq, dc, tile_indices):
        dquad = jnp.zeros((n + 1, 8), jnp.float32).at[tile_indices].add(dq)
        dcol = jnp.zeros((n + 1, 4), jnp.float32).at[tile_indices].add(dc)
        return dquad[:-1], dcol[:-1]

    sc = jax.jit(scat)
    out = sc(dq, dc, bn.tile_indices)
    print(f"scatter bwd: {timeit(sc, dq, dc, bn.tile_indices, iters=args.iters):8.2f} ms")

    # ---- fused 12-channel gather / scatter (one engine pass, not two) ----
    rows = jnp.concatenate([p.params, p.color], axis=1)
    rows_pad = jnp.concatenate([rows[bn.order], jnp.zeros((1, 12), jnp.float32)], 0)

    g12 = jax.jit(lambda r, ti: r[ti])
    tr = g12(rows_pad, bn.tile_indices)
    print(f"gather 12ch fused: {timeit(g12, rows_pad, bn.tile_indices, iters=args.iters):8.2f} ms")

    dd = jnp.concatenate([dq, dc], axis=-1)
    s12 = jax.jit(lambda u, ti: jnp.zeros((n + 1, 12), jnp.float32).at[ti].add(u)[:-1])
    s12(dd, bn.tile_indices)
    print(f"scatter 12ch fused: {timeit(s12, dd, bn.tile_indices, iters=args.iters):8.2f} ms")

    # ---- the rest of the full step: pack VJP, projection VJP, assembly ----
    def packf(tp):
        return PP.pack_tile_quads(tp, origins[:, None, :])

    tp = tr[..., :8]
    _, pack_vjp = jax.vjp(packf, tp)
    pv = jax.jit(lambda c: pack_vjp(c)[0])
    pv(tq)
    print(f"pack vjp: {timeit(pv, tq, iters=args.iters):8.2f} ms")

    def proj_loss(m, s, q, o, c):
        pr = PP.project_gaussians(m, s, q, o, c, live, cam, (H, W))
        return jnp.sum(pr.params) + jnp.sum(pr.color) + jnp.sum(pr.mean2d)

    pj = jax.jit(jax.grad(proj_loss, argnums=(0, 1, 2, 3, 4)))
    pj(means, scales, quats, opac, rgbs)
    print(f"project fwd+vjp: {timeit(pj, means, scales, quats, opac, rgbs, iters=args.iters):8.2f} ms")

    ny_, nx_ = (H + tile_h - 1) // tile_h, (W + tile_w - 1) // tile_w

    def assemble(acc_, tf_):
        rgb_tiles = acc_[..., 0:3] + tf_ * jnp.zeros(3)[None, None, :]
        full = jnp.concatenate([rgb_tiles, acc_[..., 3:4], 1.0 - tf_], axis=-1)
        full = full.reshape(ny_, nx_, tile_h, tile_w, 5)
        full = full.transpose(0, 2, 1, 3, 4).reshape(ny_ * tile_h, nx_ * tile_w, 5)
        return jnp.sum(full[:H, :W] ** 2)

    asm = jax.jit(jax.grad(assemble, argnums=(0, 1)))
    asm(acc, tf)
    print(f"assembly fwd+vjp: {timeit(asm, acc, tf, iters=args.iters):8.2f} ms")


if __name__ == "__main__":
    main()
