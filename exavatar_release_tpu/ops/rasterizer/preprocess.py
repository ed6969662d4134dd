"""3DGS screen-space preprocessing: EWA projection to conics, MXU packing.

Replaces the per-Gaussian ``preprocessCUDA`` stage of the reference's external
``diff-gaussian-rasterization-depth`` CUDA rasterizer (consumed at reference
avatar/common/nets/module.py:609-640). All math here is pure, vectorized JAX —
it autodiffs, so the backward through projection comes for free; only the
per-tile compositing (see pallas_forward/pallas_backward) needs a custom VJP.

Conventions copied from the CUDA rasterizer for gradient parity:
* view-space cull at z <= 0.2;
* EWA Jacobian with x/z, y/z clamped to ±1.3·tan(fov);
* +0.3 pixel low-pass dilation on the 2D covariance diagonal;
* radius = ceil(3·sqrt(λ_max)), λ via eigenvalues of the dilated covariance;
* NDC→pixel: ((v + 1)·S − 1)/2 (pixel centers at integer coordinates).

TPU-first design: instead of evaluating per-pixel Mahalanobis distances with
scalar math, each visible Gaussian is packed as the 6 coefficients of its
screen-space log-density quadratic q(px, py) = c0 + c1·px + c2·py + c3·px² +
c4·px·py + c5·py² (c0 includes log opacity). A tile of pixels then evaluates
all Gaussians at once as `pixel_basis (P×8) @ coeffs^T (8×G)` on the MXU.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...core.camera import Camera, get_fov


class ScreenGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities (all shapes lead with N)."""

    params: jnp.ndarray  # (N, 8) [conic_a, conic_b, conic_c, gx, gy, log_op, 0, 0]
    color: jnp.ndarray  # (N, 4) [r, g, b, depth]
    mean2d: jnp.ndarray  # (N, 2) pixel coords
    depth: jnp.ndarray  # (N,) view-space z
    radius: jnp.ndarray  # (N,) float screen-space radius (0 for culled)
    in_frustum: jnp.ndarray  # (N,) bool
    # (N, 2) per-axis half-extent of the alpha >= 1/255 superlevel ellipse
    # (tight AABB; <= radius on both axes). Binning on this instead of the
    # CUDA circle drops ONLY pairs whose alpha the kernel would zero anyway
    # (renderCUDA also skips alpha < 1/255), so the image and gradients are
    # unchanged while pair counts shrink with anisotropy and low opacity.
    extent: jnp.ndarray = None


def pack_tile_quads(params: jnp.ndarray, origins: jnp.ndarray) -> jnp.ndarray:
    """Per-tile-local quadratic coefficients from gathered conic params.

    params: (..., 8) rows [A, B, C, gx, gy, log_op, _, _] (already gathered per
    tile); origins: broadcastable (..., 2) float pixel origin of each tile.
    Returns (..., 8) rows [c0, c1, c2, c3, c4, c5, log_op, 0] such that
    q(px, py) = c0 + c1·px + c2·py + c3·px² + c4·px·py + c5·py² equals
    log_op − 0.5·mahalanobis² at tile-LOCAL pixel coords (px, py).

    Tile-local evaluation is a numerical necessity on TPU: in global pixel
    coordinates px² reaches ~4e6 at 1080p and the f32 quadratic cancels
    catastrophically; local coordinates keep every term small.
    """
    A, B, C = params[..., 0], params[..., 1], params[..., 2]
    gx = params[..., 3] - origins[..., 0]
    gy = params[..., 4] - origins[..., 1]
    log_op = params[..., 5]
    c3 = -0.5 * A
    c4 = -B
    c5 = -0.5 * C
    c1 = A * gx + B * gy
    c2 = B * gx + C * gy
    c0 = -0.5 * (A * gx * gx + 2.0 * B * gx * gy + C * gy * gy) + log_op
    return jnp.stack([c0, c1, c2, c3, c4, c5, log_op, jnp.zeros_like(c0)], axis=-1)


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    rgbs: jnp.ndarray,
    live: jnp.ndarray,
    cam: Camera,
    img_shape: Tuple[int, int],
    mean2d_offset: jnp.ndarray | None = None,
) -> ScreenGaussians:
    """Project N world-space Gaussians to screen space.

    means3d (N,3) world; scales (N,3) linear (already exp'd); quats (N,4) wxyz;
    opacities (N,1) in [0,1]; rgbs (N,3); live (N,) bool mask of real rows.
    ``mean2d_offset`` (N,2), normally zeros, exists so that callers can take
    gradients w.r.t. the screen-space means — the densification signal the
    reference reads from `means2D.grad` (avatar/main/train.py:51).
    """
    H, W = int(img_shape[0]), int(img_shape[1])
    f32 = jnp.float32
    means3d = means3d.astype(f32)

    # Structure-of-arrays throughout: every intermediate is a flat (N,)
    # vector. (N,3)/(N,3,3) tensors put the size-3 axes on the TPU's
    # 128-wide lane dim (<3% VPU utilization) and the batched 3x3 matmuls
    # lower to lane-starved loops — measured ~10 ms/step of the 1080p/100k
    # projection fwd+vjp on v5e; the SoA form is ~1 ms.
    R = cam.R.astype(f32)
    t = cam.t.astype(f32)
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    # --- view transform -----------------------------------------------------
    pvx = mx * R[0, 0] + my * R[0, 1] + mz * R[0, 2] + t[0]
    pvy = mx * R[1, 0] + my * R[1, 1] + mz * R[1, 2] + t[1]
    depth = mx * R[2, 0] + my * R[2, 1] + mz * R[2, 2] + t[2]
    in_front = depth > 0.2  # CUDA near-cull threshold

    fov = get_fov(cam.focal, (H, W))
    tan_fovx = jnp.tan(fov[0] / 2.0)
    tan_fovy = jnp.tan(fov[1] / 2.0)
    # CUDA uses focal derived from image size + fov (principal point ignored)
    focal_x = W / (2.0 * tan_fovx)
    focal_y = H / (2.0 * tan_fovy)

    # --- NDC / pixel projection --------------------------------------------
    safe_z = jnp.where(in_front, depth, 1.0)
    inv_z = 1.0 / safe_z
    ndc_x = pvx * inv_z * (1.0 / tan_fovx)
    ndc_y = pvy * inv_z * (1.0 / tan_fovy)
    px = ((ndc_x + 1.0) * W - 1.0) * 0.5
    py = ((ndc_y + 1.0) * H - 1.0) * 0.5
    mean2d = jnp.stack([px, py], axis=1)
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset.astype(f32)

    # --- EWA: 2D covariance (SoA; same math as covariance_from_scale_quat
    # + the einsum sandwich, full f32) ---------------------------------------
    q = quats.astype(f32)
    qn = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    s0 = scales[:, 0].astype(f32)
    s1 = scales[:, 1].astype(f32)
    s2 = scales[:, 2].astype(f32)
    # M = R(q) @ diag(s), row-major components
    m00 = (1 - 2 * (qy * qy + qz * qz)) * s0
    m01 = (2 * (qx * qy - qw * qz)) * s1
    m02 = (2 * (qx * qz + qw * qy)) * s2
    m10 = (2 * (qx * qy + qw * qz)) * s0
    m11 = (1 - 2 * (qx * qx + qz * qz)) * s1
    m12 = (2 * (qy * qz - qw * qx)) * s2
    m20 = (2 * (qx * qz - qw * qy)) * s0
    m21 = (2 * (qy * qz + qw * qx)) * s1
    m22 = (1 - 2 * (qx * qx + qy * qy)) * s2
    # cov3d = M @ M^T, six unique components
    cxx = m00 * m00 + m01 * m01 + m02 * m02
    cxy = m00 * m10 + m01 * m11 + m02 * m12
    cxz = m00 * m20 + m01 * m21 + m02 * m22
    cyy = m10 * m10 + m11 * m11 + m12 * m12
    cyz = m10 * m20 + m11 * m21 + m12 * m22
    czz = m20 * m20 + m21 * m21 + m22 * m22

    tx = jnp.clip(pvx * inv_z, -1.3 * tan_fovx, 1.3 * tan_fovx) * safe_z
    ty = jnp.clip(pvy * inv_z, -1.3 * tan_fovy, 1.3 * tan_fovy) * safe_z
    # J rows for x' = fx·x/z, y' = fy·y/z (third row dropped)
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * (inv_z * inv_z)
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * (inv_z * inv_z)
    # T = J @ R_view (2x3), component-wise
    t00 = j00 * R[0, 0] + j02 * R[2, 0]
    t01 = j00 * R[0, 1] + j02 * R[2, 1]
    t02 = j00 * R[0, 2] + j02 * R[2, 2]
    t10 = j11 * R[1, 0] + j12 * R[2, 0]
    t11 = j11 * R[1, 1] + j12 * R[2, 1]
    t12 = j11 * R[1, 2] + j12 * R[2, 2]
    # cov2d = T Σ T^T
    s0x = t00 * cxx + t01 * cxy + t02 * cxz
    s0y = t00 * cxy + t01 * cyy + t02 * cyz
    s0z = t00 * cxz + t01 * cyz + t02 * czz
    s1x = t10 * cxx + t11 * cxy + t12 * cxz
    s1y = t10 * cxy + t11 * cyy + t12 * cyz
    s1z = t10 * cxz + t11 * cyz + t12 * czz
    a = s0x * t00 + s0y * t01 + s0z * t02 + 0.3
    b = s0x * t10 + s0y * t11 + s0z * t12
    c = s1x * t10 + s1y * t11 + s1z * t12 + 0.3

    det = a * c - b * b
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    conic_a = c / safe_det
    conic_b = -b / safe_det
    conic_c = a / safe_det

    # --- screen radius (CUDA: 3 sigma of the larger eigenvalue, ceil) -------
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    visible = in_front & det_ok & (live if live is not None else True)
    radius = jnp.where(visible, radius, 0.0)

    # --- tight per-axis extents of the contributing region ------------------
    # alpha = exp(log_op - 0.5 M^2) >= 1/255  <=>  M^2 <= 2(log_op + ln 255);
    # the AABB of that ellipse has half-extents sqrt(c_lvl * Sigma_xx/yy)
    # (Sigma = dilated 2D covariance). +1 px pad absorbs f32 boundary
    # rounding; clamped by the CUDA circle so it is never looser.
    log_op = jnp.log(jnp.clip(opacities[:, 0].astype(f32), 1e-12, 1.0))
    c_lvl = jnp.maximum(2.0 * (log_op + 5.5413), 0.0)  # ln 255 = 5.5413
    ext_x = jnp.minimum(jnp.sqrt(c_lvl * jnp.maximum(a, 0.0)) + 1.0, radius)
    ext_y = jnp.minimum(jnp.sqrt(c_lvl * jnp.maximum(c, 0.0)) + 1.0, radius)
    extent = jnp.where(
        (visible & (c_lvl > 0.0))[:, None],
        jnp.stack([ext_x, ext_y], axis=1),
        0.0,
    )

    # --- conic packing --------------------------------------------------------
    # power(p) = -0.5·A·dx² - B·dx·dy - 0.5·C·dy², d = p - mean2d;
    # per-tile-local quadratic coefficients are derived later by
    # ``pack_tile_quads`` (tile-local coords avoid f32 cancellation).
    # dead rows: drive alpha to 0 by -inf-ish bias (finite to avoid NaN grads)
    log_op_eff = jnp.where(visible, log_op, -1e9)
    zeros = jnp.zeros_like(log_op)
    params = jnp.stack(
        [conic_a, conic_b, conic_c, mean2d[:, 0], mean2d[:, 1], log_op_eff,
         zeros, zeros],
        axis=1,
    )
    color = jnp.concatenate(
        [rgbs.astype(f32), depth[:, None].astype(f32)], axis=1
    )
    return ScreenGaussians(
        params=params,
        color=color,
        mean2d=mean2d,
        depth=depth,
        radius=radius,
        in_frustum=visible,
        extent=jax.lax.stop_gradient(extent),
    )
