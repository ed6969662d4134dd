"""AOT Mosaic lowering checks: catch TPU-only Pallas constraint violations
from the CPU test environment via jax.export cross-platform lowering."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exavatar_release_tpu.core.camera import Camera
from exavatar_release_tpu.ops.rasterizer import pallas_kernels as pk
from exavatar_release_tpu.ops.rasterizer.api import RasterizeSettings, rasterize


def test_composite_kernels_lower_for_tpu():
    T, K, chunk = 4, 512, 256
    th, tw = 8, 128
    P = th * tw
    quad = jnp.zeros((T, K, 8))
    color = jnp.zeros((T, K, 4))
    counts = jnp.zeros((T,), jnp.int32)

    jax.export.export(
        jax.jit(lambda q, c, n: pk.composite_tiles_fwd(q, c, n, (th, tw), chunk, False)),
        platforms=["tpu"],
    )(quad, color, counts)

    g1 = jnp.zeros((T, P, 4))
    g2 = jnp.zeros((T, P, 1))
    a = jnp.zeros((T, P, 4))
    t = jnp.zeros((T, P, 1))
    jax.export.export(
        jax.jit(
            lambda q, c, n, ga, gt, aa, tt: pk.composite_tiles_bwd(
                q, c, n, ga, gt, aa, tt, (th, tw), chunk, False
            )
        ),
        platforms=["tpu"],
    )(quad, color, counts, g1, g2, a, t)

    # in-kernel localization path (GLOBAL rows + per-tile origins)
    origins = jnp.zeros((T, 2))
    jax.export.export(
        jax.jit(lambda q, c, n, o: pk.composite_tiles_fwd(
            q, c, n, (th, tw), chunk, False, tile_origins=o)),
        platforms=["tpu"],
    )(quad, color, counts, origins)
    jax.export.export(
        jax.jit(
            lambda q, c, n, ga, gt, aa, tt, o: pk.composite_tiles_bwd(
                q, c, n, ga, gt, aa, tt, (th, tw), chunk, False,
                tile_origins=o,
            )
        ),
        platforms=["tpu"],
    )(quad, color, counts, g1, g2, a, t, origins)


def test_full_rasterize_grad_lowers_for_tpu(rng):
    n = 64
    H, W = 64, 256
    means = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32) + np.asarray([0, 0, 4]))
    scales = jnp.full((n, 3), 0.05)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n, 1), 0.5)
    rgbs = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    live = jnp.ones((n,), bool)
    cam = Camera(R=jnp.eye(3), t=jnp.zeros(3), focal=jnp.asarray([150.0, 150.0]),
                 princpt=jnp.asarray([W / 2.0, H / 2.0]))
    settings = RasterizeSettings(backend="pallas", max_per_tile=256, interpret=False)

    def loss(m, s, q, o, r):
        out = rasterize(m, s, q, o, r, live, cam, (H, W), jnp.zeros(3), settings)
        return jnp.sum(out["img"]) + jnp.sum(out["mask"])

    jax.export.export(
        jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))), platforms=["tpu"]
    )(means, scales, quats, opac, rgbs)
