"""Geometry utilities: covariances, normals, Procrustes alignment.

Replaces the reference's PyTorch3D dependencies with pure JAX:
* covariance from scale+rotation (reference avatar/common/utils/transforms.py:72-80)
* per-vertex normals (pytorch3d Meshes.verts_normals_packed equivalent,
  used at reference avatar/common/nets/module.py:502)
* Umeyama similarity alignment (pytorch3d corresponding_points_alignment,
  used at reference fitting/data/Custom/Custom.py:155)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .rotations import quaternion_to_matrix


def covariance_from_scale_quat(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """3D covariance M = R S S^T R^T. scale: (..., 3); quat: (..., 4) wxyz."""
    R = quaternion_to_matrix(quat)
    RS = R * scale[..., None, :]  # R @ diag(scale)
    return jnp.matmul(RS, jnp.swapaxes(RS, -1, -2), precision=jax.lax.Precision.HIGHEST)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted per-vertex normals, normalized.

    verts: (V, 3) float; faces: (F, 3) int. Matches pytorch3d's
    verts_normals_packed (sum of un-normalized face normals, then normalize).
    """
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted face normals
    normals = jnp.zeros_like(verts)
    normals = normals.at[faces[:, 0]].add(fn)
    normals = normals.at[faces[:, 1]].add(fn)
    normals = normals.at[faces[:, 2]].add(fn)
    # double-where: cancelled/unreferenced vertices have zero accumulated
    # normals; norm(0) would NaN the backward pass
    degen = jnp.sum(normals * normals, axis=-1, keepdims=True) < 1e-24
    safe = jnp.where(degen, jnp.array([0.0, 0.0, 1.0]), normals)
    return jnp.where(degen, 0.0, safe / jnp.linalg.norm(safe, axis=-1, keepdims=True))


def umeyama(
    src: jnp.ndarray, dst: jnp.ndarray, estimate_scale: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Similarity transform (R, t, s) minimizing ||s * src @ R^T + t - dst||².

    src, dst: (N, 3). Returns R (3,3), t (3,), s scalar, such that
    aligned = s * src @ R.T + t.
    """
    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    xs = src - mu_src
    xd = dst - mu_dst
    cov = jnp.matmul(xd.T, xs, precision=jax.lax.Precision.HIGHEST) / src.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = jnp.matmul(jnp.matmul(U, S, precision=jax.lax.Precision.HIGHEST), Vt, precision=jax.lax.Precision.HIGHEST)
    var_src = (xs**2).sum() / src.shape[0]
    s = jnp.where(
        estimate_scale, jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var_src, 1e-12), 1.0
    )
    t = mu_dst - s * (R @ mu_src)
    return R, t, s


def transform_points_homogeneous(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) transforms to (..., 3) points."""
    p1 = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...j->...i", T, p1)
    return out[..., :3]
