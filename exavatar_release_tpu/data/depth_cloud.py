"""Background point cloud from monocular depth predictions.

The algorithmic half of the reference's Depth-Anything shim (reference
fitting/tools/code_to_copy/run_depth_anything.py:82-121): rescale the
relative depth map onto the SMPL-X mesh's rendered metric depth (mean
absolute deviation matching), accumulate background pixels over frames, and
back-project into a colored point cloud. The depth network itself stays an
external pluggable step; this module turns its outputs into the
``bkg_point_cloud.txt`` the avatar stage consumes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.mesh_raster import rasterize_mesh


def render_smplx_depth(
    verts_cam: np.ndarray,
    faces: np.ndarray,
    focal,
    princpt,
    img_shape: Tuple[int, int],
) -> np.ndarray:
    """(H, W) metric depth of the posed mesh; 0 where no mesh."""
    frags = rasterize_mesh(
        jnp.asarray(verts_cam), jnp.asarray(faces), jnp.asarray(focal),
        jnp.asarray(princpt), img_shape,
    )
    z = np.array(frags.zbuf)  # writable copy
    z[~np.isfinite(z)] = 0.0
    return z


def align_depth_to_smplx(
    rel_depth: np.ndarray,  # (H, W) relative depth, LOW = close
    smplx_depth: np.ndarray,  # (H, W) metric depth render, 0 = background
) -> np.ndarray:
    """Scale+shift the relative depth onto the mesh's metric depth by
    matching the mean absolute deviation over mesh pixels (reference
    run_depth_anything.py:93-98)."""
    fg = smplx_depth > 0
    if fg.sum() < 16:
        return rel_depth
    d = rel_depth.astype(np.float64)
    scale = np.abs(d[fg] - d[fg].mean()).mean()
    scale_s = np.abs(smplx_depth[fg] - smplx_depth[fg].mean()).mean()
    d = d / max(scale, 1e-9) * scale_s
    d = d - d[fg].mean() + smplx_depth[fg].mean()
    return d.astype(np.float32)


class BkgCloudAccumulator:
    """Per-frame accumulation of background depth/color (reference
    run_depth_anything.py:100-108) + final back-projection (109-121)."""

    def __init__(self, img_shape: Tuple[int, int]):
        H, W = img_shape
        self.depth = np.zeros((H, W), np.float64)
        self.color = np.zeros((H, W, 3), np.float64)
        self.count = np.zeros((H, W), np.float64)

    def add(self, aligned_depth: np.ndarray, img_rgb: np.ndarray,
            human_mask: np.ndarray) -> None:
        """img_rgb (H, W, 3) in [0, 1]; human_mask (H, W) 1 = human."""
        is_bkg = human_mask < 0.5
        self.depth += aligned_depth * is_bkg
        self.color += img_rgb * is_bkg[..., None]
        self.count += is_bkg

    def point_cloud(self, focal, princpt) -> np.ndarray:
        """(N, 6) [xyz in camera frame, rgb 0..1] of all seen-background
        pixels, averaged over frames."""
        H, W = self.depth.shape
        seen = self.count > 0
        z = self.depth / np.maximum(self.count, 1e-6)
        c = self.color / np.maximum(self.count, 1e-6)[..., None]
        jj, ii = np.meshgrid(np.arange(W), np.arange(H))
        x = (jj - princpt[0]) / focal[0] * z
        y = (ii - princpt[1]) / focal[1] * z
        pts = np.stack([x[seen], y[seen], z[seen]], axis=1)
        cols = c[seen]
        return np.concatenate([pts, cols], axis=1).astype(np.float32)


def save_bkg_point_cloud(path: str, cloud: np.ndarray) -> None:
    np.savetxt(path, cloud, fmt="%.6f")
