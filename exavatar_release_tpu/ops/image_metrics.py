"""Image metrics: windowed SSIM and PSNR in pure JAX.

SSIM matches the reference implementation exactly (reference
avatar/common/nets/loss.py:32-77: 11x11 Gaussian window, sigma 1.5,
per-channel depthwise conv with zero padding, C1=0.01², C2=0.03²) — the
depthwise convolution runs as ``lax.conv_general_dilated`` with channel
feature groups, which XLA maps onto the MXU.

PSNR matches the eval tool (reference avatar/tools/eval_neuman.py:27-65 via
torchmetrics, data_range=1).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_window_1d(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Normalized 1D Gaussian window (reference loss.py:35-39)."""
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Normalized 2D Gaussian window (reference loss.py:35-43)."""
    g = np.asarray(gaussian_window_1d(window_size, sigma))
    return jnp.asarray(np.outer(g, g).astype(np.float32))


def _depthwise_conv(img: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """img: (C, H, W); g: (k,) 1-D window, zero padding.

    The reference's 2D window is outer(g, g), which is exactly two
    sequential 1-D depthwise convs (zero padding commutes with separable
    kernels) — 2k MACs/pixel instead of k², ~180 ms/step at 1080p on v5e
    as five 11x11 convs per SSIM call.

    Precision MUST be HIGHEST: with TPU DEFAULT the conv inputs round to
    bf16, and SSIM's variance sigma^2 = E[x^2] - mu^2 is a catastrophic
    cancellation — for near-constant windows the bf16 error (~8e-3) dwarfs
    the true variance AND the C2=9e-4 stabilizer, so the denominator's sign
    flips and SSIM leaves [-1, 1] by orders of magnitude (measured on v5e:
    ssim_map of two smooth [0,1] images spanned [-6061, +13827] — the
    round-3 512x896 training divergence). f32 convs make the error ~1e-6.
    """
    C = img.shape[0]
    k = g.shape[0]
    kw = jnp.broadcast_to(g[None, None, None, :], (C, 1, 1, k))
    kh = jnp.broadcast_to(g[None, None, :, None], (C, 1, k, 1))
    x = jax.lax.conv_general_dilated(
        img[None], kw, window_strides=(1, 1),
        padding=[(0, 0), (k // 2, k // 2)],
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1),
        padding=[(k // 2, k // 2), (0, 0)],
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0]


def ssim_map(
    img_out: jnp.ndarray,
    img_target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    window_size: int = 11,
) -> jnp.ndarray:
    """Per-pixel SSIM map of (C, H, W) images in [0, 1].

    ``mask`` (1, H, W) or (H, W), applied multiplicatively to both inputs
    BEFORE windowing, exactly like the reference (loss.py:46-48).
    """
    if mask is not None:
        m = mask if mask.ndim == 3 else mask[None]
        img_out = img_out * m
        img_target = img_target * m
    w = gaussian_window_1d(window_size)
    mu1 = _depthwise_conv(img_out, w)
    mu2 = _depthwise_conv(img_target, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img_out * img_out, w) - mu1_sq
    sigma2_sq = _depthwise_conv(img_target * img_target, w) - mu2_sq
    sigma12 = _depthwise_conv(img_out * img_target, w) - mu1_mu2
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    return ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )


def psnr(img_out: jnp.ndarray, img_target: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR in dB; with a mask, MSE over masked pixels only."""
    err = (img_out - img_target) ** 2
    if mask is not None:
        m = jnp.broadcast_to(mask if mask.ndim == err.ndim else mask[None], err.shape)
        mse = jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        mse = jnp.mean(err)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def bbox_mask(img_shape, bbox: jnp.ndarray) -> jnp.ndarray:
    """(H, W) float mask of an [xmin, ymin, width, height] pixel bbox.

    Static-shape replacement for the reference's dynamic crop
    (loss.py:18-27): losses crop to the human bbox; under jit we mask
    instead and take masked means.
    """
    H, W = img_shape
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    # reference clamp order (loss.py:20-24): xmax derives from the RAW xmin
    xmax = jnp.minimum(jnp.floor(bbox[0]) + jnp.floor(bbox[2]), W)
    ymax = jnp.minimum(jnp.floor(bbox[1]) + jnp.floor(bbox[3]), H)
    xmin = jnp.maximum(jnp.floor(bbox[0]), 0.0)
    ymin = jnp.maximum(jnp.floor(bbox[1]), 0.0)
    return ((xs >= xmin) & (xs < xmax) & (ys >= ymin) & (ys < ymax)).astype(jnp.float32)


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of (C, H, W) or (H, W) over mask (H, W); plain mean if None."""
    if mask is None:
        return jnp.mean(x)
    m = jnp.broadcast_to(mask if x.ndim == mask.ndim else mask[None], x.shape)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)
