"""Pinhole cameras, view/projection matrices, coordinate transforms.

Matches the reference conventions (reference avatar/common/utils/transforms.py:18-70
and the graphdeco-inria 3DGS camera setup referenced at
avatar/common/nets/module.py:600-608):

* world->camera: x_cam = R @ x_world + t
* view matrix V = [[R, t], [0, 1]]; the rasterizer consumes V^T ("row-major")
* projection is an OpenGL-style perspective from FoV with z_near=0.01,
  z_far=100, z_sign=+1; full projection P_full^T = V^T @ P^T.

A ``Camera`` is a pytree of arrays so it can cross jit boundaries.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Pinhole camera. All fields are arrays (pytree-compatible)."""

    R: jnp.ndarray  # (3, 3) world->cam rotation
    t: jnp.ndarray  # (3,)  world->cam translation
    focal: jnp.ndarray  # (2,) fx, fy in pixels
    princpt: jnp.ndarray  # (2,) cx, cy in pixels

    @property
    def position(self) -> jnp.ndarray:
        """Camera center in world coordinates: -R^T t."""
        return -self.R.T @ self.t

    def replace(self, **kw) -> "Camera":
        return self._replace(**kw)


def world_to_cam(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) world points -> camera frame."""
    return points @ R.T + t[None, :]


def cam_to_world(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return (points - t[None, :]) @ R


def cam_to_pixel(cam_points: jnp.ndarray, focal, princpt) -> jnp.ndarray:
    """Perspective projection to pixels, keeping z (reference transforms.py:18-22)."""
    z = cam_points[..., 2]
    x = cam_points[..., 0] / z * focal[0] + princpt[0]
    y = cam_points[..., 1] / z * focal[1] + princpt[1]
    return jnp.stack([x, y, z], axis=-1)


def pixel_to_cam(pix_points: jnp.ndarray, focal, princpt) -> jnp.ndarray:
    z = pix_points[..., 2]
    x = (pix_points[..., 0] - princpt[0]) / focal[0] * z
    y = (pix_points[..., 1] - princpt[1]) / focal[1] * z
    return jnp.stack([x, y, z], axis=-1)


def get_fov(focal, img_shape: Tuple[int, int]) -> jnp.ndarray:
    """(fov_x, fov_y) radians. img_shape is (H, W) (reference transforms.py:66-70)."""
    fov_x = 2.0 * jnp.arctan(img_shape[1] / (2.0 * focal[0]))
    fov_y = 2.0 * jnp.arctan(img_shape[0] / (2.0 * focal[1]))
    return jnp.stack([fov_x, fov_y])


def get_view_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """4x4 world->camera matrix [[R, t], [0, 1]] (reference transforms.py:38-41)."""
    top = jnp.concatenate([R, t.reshape(3, 1)], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def get_proj_matrix(
    focal,
    img_shape: Tuple[int, int],
    z_near: float = 0.01,
    z_far: float = 100.0,
) -> jnp.ndarray:
    """OpenGL-style perspective projection (reference transforms.py:43-64).

    Symmetric frustum from FoV (the reference zeroes the off-center terms by
    construction since top=-bottom, right=-left; we keep the same algebra)."""
    fov = get_fov(focal, img_shape)
    tan_half_x = jnp.tan(fov[0] / 2.0)
    tan_half_y = jnp.tan(fov[1] / 2.0)
    z_sign = 1.0
    P = jnp.zeros((4, 4), dtype=jnp.result_type(tan_half_x, jnp.float32))
    P = P.at[0, 0].set(1.0 / tan_half_x)
    P = P.at[1, 1].set(1.0 / tan_half_y)
    P = P.at[3, 2].set(z_sign)
    P = P.at[2, 2].set(z_sign * z_far / (z_far - z_near))
    P = P.at[2, 3].set(-(z_far * z_near) / (z_far - z_near))
    return P


def full_projection(cam: Camera, img_shape: Tuple[int, int]) -> jnp.ndarray:
    """P @ V: maps world homogeneous points to clip space."""
    V = get_view_matrix(cam.R, cam.t)
    P = get_proj_matrix(cam.focal, img_shape)
    return P @ V


def look_at(eye: jnp.ndarray, target: jnp.ndarray, up: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World->cam (R, t) for a camera at `eye` looking at `target`.

    Camera frame: +z forward (towards target), +x right, +y down — the same
    OpenCV-style convention the reference datasets use."""
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)
    t = -R @ eye
    return R, t
