"""Rotation representation conversions in pure JAX.

Conventions follow the ones the reference relies on through
``pytorch3d.transforms`` (see reference avatar/common/nets/module.py:4):

* quaternions are (w, x, y, z), unit norm;
* the 6D representation is the first two ROWS of the rotation matrix,
  flattened (Zhou et al., CVPR 2019), orthonormalised on decode;
* axis-angle vectors encode angle = ||v|| about axis v/||v||.

All functions broadcast over leading batch dimensions and are jit/vmap/grad
safe (no data-dependent control flow; Taylor fallbacks near angle=0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Small fixed-size (3x3) matrix products must run in full f32 even on TPU,
# where the default matmul precision is bf16; geometry cannot afford that.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. axis_angle: (..., 3) -> (..., 3, 3)."""
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = sq < 1e-12
    # double-where: the "full" branch must never see the degenerate input,
    # otherwise NaNs leak through jnp.where in the backward pass
    safe_aa = jnp.where(small, jnp.ones_like(axis_angle), axis_angle)
    angle = jnp.linalg.norm(safe_aa, axis=-1, keepdims=True)
    axis = safe_aa / angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    R_full = eye + s * K + (1.0 - c) * _mm(K, K)
    # Taylor: R ≈ I + K*theta for tiny angles, with K built from the raw vector
    wx, wy, wz = axis_angle[..., 0], axis_angle[..., 1], axis_angle[..., 2]
    K_raw = jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )
    R_small = eye + K_raw
    return jnp.where(small[..., None], R_small, R_full)


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3). Via quaternion for numerical robustness."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) (..., 4) -> (..., 3, 3)."""
    q = quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) with w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions
    and select the one keyed to the largest diagonal combination.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # four squared magnitudes (up to scale): w², x², y², z²
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # candidate quaternions keyed by which component is largest
    w_w = safe_sqrt(qw2)
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (
        2.0 * w_w[..., None]
    )
    x_x = safe_sqrt(qx2)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1) / (
        2.0 * x_x[..., None]
    )
    y_y = safe_sqrt(qy2)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1) / (
        2.0 * y_y[..., None]
    )
    z_z = safe_sqrt(qz2)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1) / (
        2.0 * z_z[..., None]
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    quat = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    quat = quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    # canonical sign: w >= 0
    return jnp.where(quat[..., :1] < 0, -quat, quat)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    q = quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    q = jnp.where(q[..., :1] < 0, -q, q)  # w >= 0 -> angle in [0, pi]
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = sq < 1e-12
    safe_v = jnp.where(small, jnp.ones_like(v), v)
    sin_half = jnp.linalg.norm(safe_v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # small-angle: angle/sin_half -> 2/w (w ~ 1)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / sin_half)
    return v * scale


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = sq < 1e-12
    safe_aa = jnp.where(small, jnp.ones_like(axis_angle), axis_angle)
    angle = jnp.linalg.norm(safe_aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(x/2)/x -> 1/2 - x^2/48 as x -> 0
    sinc_half = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    xyz = axis_angle * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two rows flattened (pytorch3d convention)."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (pytorch3d convention).

    Degenerate inputs (zero rows — e.g. dead rows of fixed-capacity Gaussian
    buffers) are routed through the double-where pattern so the backward pass
    stays NaN-free."""
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], d6.dtype), a1.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], d6.dtype), a2.shape)

    deg1 = jnp.sum(a1 * a1, axis=-1, keepdims=True) < _EPS
    a1s = jnp.where(deg1, ex, a1)
    b1 = a1s / jnp.linalg.norm(a1s, axis=-1, keepdims=True)

    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2r = a2 - a2_proj
    deg2 = jnp.sum(b2r * b2r, axis=-1, keepdims=True) < _EPS
    # fallback: any vector not collinear with b1
    alt = ey - jnp.sum(b1 * ey, axis=-1, keepdims=True) * b1
    alt = jnp.where(jnp.sum(alt * alt, axis=-1, keepdims=True) < _EPS,
                    jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d6.dtype), a2.shape),
                    alt)
    b2s = jnp.where(deg2, alt, b2r)
    b2 = b2s / jnp.linalg.norm(b2s, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def axis_angle_to_rotation_6d(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w, x, y, z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
