"""Freeze golden rasterizer tensors (BASELINE gradient-correctness gate).

Renders 4 canonical small scenes through the jax_ref oracle backend on CPU
and stores inputs, forward outputs, and input gradients into
tests/goldens/scene{i}.npz. The committed files pin the renderCUDA-matched
semantics against silent drift; when a CUDA host is available, capture the
reference diff-gaussian-rasterization-depth outputs on the SAME stored
inputs and diff directly (PARITY.md documents the procedure).

Usage: JAX_PLATFORMS=cpu python tools/make_goldens.py
"""
import os
import os.path as osp
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# a sitecustomize may have imported jax with the TPU plugin selected; the
# config snapshot wins over os.environ (same guard as tests/conftest.py) —
# goldens MUST be CPU-computed or they bake in TPU matmul precision
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform == "cpu", jax.devices()

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from exavatar_release_tpu.core.camera import Camera
from exavatar_release_tpu.ops.rasterizer import RasterizeSettings, rasterize

OUT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tests", "goldens")
SETTINGS = RasterizeSettings(
    backend="ref", tile_h=8, tile_w=128, max_per_tile=64, chunk=32
)


def make_inputs(seed, n, img, opac_range=(0.2, 0.95), scale_range=(0.02, 0.12),
                big_gaussian=False, opaque_front=False):
    rng = np.random.default_rng(seed)
    H, W = img
    focal = 150.0
    z = rng.uniform(2.0, 4.0, (n, 1)).astype(np.float32)
    x = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (W / focal) * z / 2
    y = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (H / focal) * z / 2
    means = np.concatenate([x, y, z], 1)
    scales = np.exp(rng.uniform(
        np.log(scale_range[0]), np.log(scale_range[1]), (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(*opac_range, (n, 1)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    if big_gaussian:  # one footprint spanning many tiles
        means[0] = [0.0, 0.0, 2.5]
        scales[0] = [0.8, 0.8, 0.8]
        opac[0] = 0.6
    if opaque_front:  # exercise alpha clamp + sticky early termination
        k = n // 3
        opac[:k] = 0.999
        means[:k, 2] = 2.0
    return dict(
        means3d=means, scales=scales, quats=quats, opacities=opac, rgbs=rgbs,
        live=np.ones((n,), bool), H=np.int32(H), W=np.int32(W),
        focal=np.float32(focal),
        bg=np.array([1.0, 0.5, 0.25], np.float32),
    )


def render_case(d):
    cam = Camera(
        R=jnp.eye(3), t=jnp.zeros(3),
        focal=jnp.asarray([d["focal"], d["focal"]]),
        princpt=jnp.asarray([d["W"] / 2.0, d["H"] / 2.0]),
    )
    img_shape = (int(d["H"]), int(d["W"]))
    args = tuple(jnp.asarray(d[k]) for k in
                 ("means3d", "scales", "quats", "opacities", "rgbs"))
    live = jnp.asarray(d["live"])
    bg = jnp.asarray(d["bg"])

    out = rasterize(*args, live, cam, img_shape, bg, SETTINGS)

    def loss(*a):
        r = rasterize(*a, live, cam, img_shape, bg, SETTINGS)
        # fixed nontrivial cotangent: weights every pixel differently
        H, W = img_shape
        wimg = (jnp.arange(H * W * 3, dtype=jnp.float32)
                .reshape(H, W, 3) % 7.0 + 1.0) / 7.0
        wd = (jnp.arange(H * W, dtype=jnp.float32).reshape(H, W) % 5.0 + 1.0) / 5.0
        return (jnp.sum(r["img"] * wimg) + jnp.sum(r["depth"] * wd)
                + jnp.sum(r["mask"] * wd.T.reshape(H, W)))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    return out, grads


CASES = [
    ("scene0", dict(seed=0, n=48, img=(16, 256))),
    ("scene1", dict(seed=1, n=96, img=(40, 256), big_gaussian=True)),
    ("scene2", dict(seed=2, n=64, img=(24, 256), opaque_front=True)),
    ("scene3", dict(seed=3, n=32, img=(16, 384), scale_range=(0.05, 0.3),
                    opac_range=(0.6, 0.99))),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, kw in CASES:
        d = make_inputs(**kw)
        out, grads = render_case(d)
        rec = dict(d)
        rec.update(
            img=np.asarray(out["img"]), depth=np.asarray(out["depth"]),
            mask=np.asarray(out["mask"]), radius=np.asarray(out["radius"]),
            g_means3d=np.asarray(grads[0]), g_scales=np.asarray(grads[1]),
            g_quats=np.asarray(grads[2]), g_opacities=np.asarray(grads[3]),
            g_rgbs=np.asarray(grads[4]),
        )
        path = osp.join(OUT, f"{name}.npz")
        np.savez_compressed(path, **rec)
        print(f"{path}: img {rec['img'].shape}, |g_means| "
              f"{np.abs(rec['g_means3d']).max():.4f}")


if __name__ == "__main__":
    main()
