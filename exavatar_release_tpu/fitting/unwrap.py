"""Face texture unwrapping into UV space (reference XY2UV +
fitting/main/unwrap.py:34-91).

Pipeline per frame: rasterize the mesh in UV space ONCE to get per-UV-pixel
(face index, barycentrics) — precompute; pose the FLAME mesh with the
fitted params; project the surface point of every UV pixel into the image;
visibility-test against a camera-space z-buffer of the same mesh; bilinearly
sample the video frame; average valid samples over frames.

The UV-space rasterization reuses the perspective tile rasterizer with
z == 1 (a perspective camera at focal 1 over a z=1 plane IS an orthographic
map, matching the reference's OrthographicCameras path,
fitting/common/nets/layer.py:41-51).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mesh_raster import MeshFragments, rasterize_mesh


class UVMaps(NamedTuple):
    face_idx: jnp.ndarray  # (Hu, Wu) int32, -1 outside the atlas
    bary: jnp.ndarray  # (Hu, Wu, 3)


def build_uv_maps(
    vertex_uv: jnp.ndarray,  # (Vt, 2) in [0, 1]
    face_uv: jnp.ndarray,  # (F, 3) indices into vertex_uv
    uvmap_shape: Tuple[int, int],
) -> UVMaps:
    """Precompute per-UV-pixel face index + barycentrics (reference
    XY2UV.__init__ via get_face_index_map_uv, layer.py:13-27,41-51)."""
    Hu, Wu = uvmap_shape
    # UV -> "camera" space at z=1: px = u * Wu, py = v * Hu with focal=1
    uv_scaled = jnp.stack(
        [vertex_uv[:, 0] * Wu, vertex_uv[:, 1] * Hu], axis=1
    )
    verts_cam = jnp.concatenate(
        [uv_scaled, jnp.ones((uv_scaled.shape[0], 1))], axis=1
    )
    frags = rasterize_mesh(
        verts_cam, face_uv, jnp.asarray([1.0, 1.0]), jnp.asarray([0.0, 0.0]),
        uvmap_shape, max_per_tile=512,
    )
    return UVMaps(face_idx=frags.pix_to_face, bary=frags.bary)


def unwrap_frame(
    uv_maps: UVMaps,
    mesh_cam: jnp.ndarray,  # (V, 3) posed FLAME mesh, camera space
    faces: jnp.ndarray,  # (F, 3) FLAME topology (same as face_uv order)
    img: jnp.ndarray,  # (3, H, W) video frame in [0, 1]
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    z_tol: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame's contribution: (texture (3, Hu, Wu), weight (1, Hu, Wu)).

    Visibility: the UV pixel's surface point must win (within ``z_tol``) the
    camera z-buffer of the mesh (reference unwrap.py:54-76).
    """
    H, W = img.shape[1:]
    Hu, Wu = uv_maps.face_idx.shape
    sel = jnp.maximum(uv_maps.face_idx, 0)
    tri = mesh_cam[faces[sel]]  # (Hu, Wu, 3, 3)
    pts = jnp.einsum("hwk,hwkc->hwc", uv_maps.bary, tri)  # surface points

    z = jnp.maximum(pts[..., 2], 1e-6)
    px = pts[..., 0] / z * focal[0] + princpt[0]
    py = pts[..., 1] / z * focal[1] + princpt[1]

    # z-buffer visibility from the camera
    frags_cam = rasterize_mesh(mesh_cam, faces, focal, princpt, (H, W))
    ix = jnp.clip(px.astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(py.astype(jnp.int32), 0, H - 1)
    zbuf_at = frags_cam.zbuf[iy, ix]
    visible = (z <= zbuf_at + z_tol)

    in_img = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    valid = (uv_maps.face_idx >= 0) & visible & in_img & (z > 1e-4)

    # bilinear sample the frame
    from ..ops.grid_sample import grid_sample_2d

    gx = (px + 0.5) / W * 2.0 - 1.0
    gy = (py + 0.5) / H * 2.0 - 1.0
    coords = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
    colors = grid_sample_2d(img, coords).reshape(Hu, Wu, 3)

    w = valid.astype(jnp.float32)[None]
    tex = colors.transpose(2, 0, 1) * w
    return tex, w


def unwrap_sequence(
    uv_maps: UVMaps,
    meshes_cam: jnp.ndarray,  # (F, V, 3)
    faces: jnp.ndarray,
    imgs: jnp.ndarray,  # (F, 3, H, W)
    focals: jnp.ndarray,  # (F, 2)
    princpts: jnp.ndarray,  # (F, 2)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Average unwrap over frames (reference unwrap.py:76-91). Returns
    (texture (3, Hu, Wu), texture_mask (1, Hu, Wu))."""
    def body(carry, xs):
        tex_acc, w_acc = carry
        mesh, img, fo, pp = xs
        tex, w = unwrap_frame(uv_maps, mesh, faces, img, fo, pp)
        return (tex_acc + tex, w_acc + w), None

    Hu, Wu = uv_maps.face_idx.shape
    init = (jnp.zeros((3, Hu, Wu)), jnp.zeros((1, Hu, Wu)))
    (tex_sum, w_sum), _ = jax.lax.scan(
        body, init, (meshes_cam, imgs, focals, princpts)
    )
    tex = tex_sum / jnp.maximum(w_sum, 1.0)
    mask = (w_sum > 0).astype(jnp.float32)
    return tex, mask
