"""Shared synthetic Gaussian-scene builder for rasterizer tests."""
import numpy as np
import jax.numpy as jnp

from exavatar_release_tpu.core.camera import Camera


def make_scene(rng, n=48, img=(16, 256), seed_depth=(2.0, 4.0)):
    H, W = img
    focal = jnp.array([150.0, 150.0], jnp.float32)
    princpt = jnp.array([W / 2.0, H / 2.0], jnp.float32)
    cam = Camera(R=jnp.eye(3), t=jnp.zeros(3), focal=focal, princpt=princpt)

    z = rng.uniform(*seed_depth, size=(n, 1)).astype(np.float32)
    # spread across the visible frustum
    x = rng.uniform(-0.5, 0.5, size=(n, 1)).astype(np.float32) * (W / 150.0) * z / 2
    y = rng.uniform(-0.5, 0.5, size=(n, 1)).astype(np.float32) * (H / 150.0) * z / 2
    means = np.concatenate([x, y, z], axis=1)

    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.12), size=(n, 3))).astype(
        np.float32
    )
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    rgbs = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    live = np.ones((n,), bool)
    bg = np.array([1.0, 1.0, 1.0], np.float32)
    return dict(
        means3d=jnp.asarray(means),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(opac),
        rgbs=jnp.asarray(rgbs),
        live=jnp.asarray(live),
        cam=cam,
        img_shape=img,
        bg=jnp.asarray(bg),
    )
