"""Differentiable one-face-per-pixel mesh rasterizer + UV texture renderer.

Replaces pytorch3d's ``MeshRasterizer``/``TexturesUV`` as consumed by the
reference's face-texture renderer (reference avatar/common/nets/layer.py:23-68:
blur_radius=0, faces_per_pixel=1, perspective camera with in_ndc=False) and
the UV unwrap (reference fitting/common/nets/layer.py:9-39).

TPU-native design: faces are binned to image tiles with the same machinery as
the Gaussian rasterizer (bounding circle -> tile rect), then each tile z-tests
its face list over its pixel block with fully vectorized edge functions —
static shapes, ``lax.scan`` over face chunks, no per-pixel scalar loops.
Face *selection* (z-buffer winner) is non-differentiable (stop_gradient, as
in the reference's hard rasterization); barycentrics are then recomputed
differentiably for the winning face, so gradients flow to vertices through
the barycentric coordinates and to the texture through the UV sample.

Pixel convention: pixel (i, j) has center (j + 0.5, i + 0.5); projection is
px = fx·x/z + cx (OpenCV-style, same as core.camera.cam_to_pixel).
Barycentrics are perspective-correct (pytorch3d default for perspective
cameras).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_2d
from .rasterizer.binning import bin_gaussians, tile_grid


class MeshFragments(NamedTuple):
    pix_to_face: jnp.ndarray  # (H, W) int32, -1 = background
    bary: jnp.ndarray  # (H, W, 3) perspective-correct barycentrics
    zbuf: jnp.ndarray  # (H, W) view-space z of the hit (inf = background)


def _edge_bary(px, py, v0, v1, v2):
    """Screen-space barycentrics of pixels (..., 1) against triangles (3, 2).

    px, py: pixel coords broadcastable against the face axis.
    v0, v1, v2: (..., 2) triangle screen vertices. Returns (b0, b1, b2, area).
    """
    x0, y0 = v0[..., 0], v0[..., 1]
    x1, y1 = v1[..., 0], v1[..., 1]
    x2, y2 = v2[..., 0], v2[..., 1]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    w0 = (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)
    w1 = (x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)
    w2 = (x0 - px) * (y1 - py) - (x1 - px) * (y0 - py)
    safe = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    return w0 / safe, w1 / safe, w2 / safe, area


def rasterize_mesh(
    verts_cam: jnp.ndarray,
    faces: jnp.ndarray,
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    img_shape: Tuple[int, int],
    tile_h: int = 8,
    tile_w: int = 128,
    max_per_tile: int = 512,
    z_near: float = 1e-4,
) -> MeshFragments:
    """Z-buffer rasterization of a camera-space mesh.

    verts_cam: (V, 3) with +z forward; faces: (F, 3) int32.
    Returns per-pixel winning face, perspective-correct barycentrics, depth.
    """
    H, W = int(img_shape[0]), int(img_shape[1])
    ny, nx = tile_grid((H, W), tile_h, tile_w)
    F = faces.shape[0]

    z = verts_cam[:, 2]
    safe_z = jnp.where(z > z_near, z, 1.0)
    sx = verts_cam[:, 0] / safe_z * focal[0] + princpt[0]
    sy = verts_cam[:, 1] / safe_z * focal[1] + princpt[1]
    screen = jnp.stack([sx, sy], axis=1)  # (V, 2)
    inv_z = 1.0 / safe_z

    tri = screen[faces]  # (F, 3, 2)
    tri_z_ok = (z[faces] > z_near).all(axis=1)  # cull faces crossing near plane
    lo = tri.min(axis=1)
    hi = tri.max(axis=1)
    center = 0.5 * (lo + hi)
    radius = 0.5 * jnp.linalg.norm(hi - lo, axis=1) + 1.0
    depth_key = z[faces].min(axis=1)

    binning = bin_gaussians(
        jax.lax.stop_gradient(center),
        jax.lax.stop_gradient(jnp.where(tri_z_ok, radius, 0.0)),
        jax.lax.stop_gradient(depth_key),
        tri_z_ok,
        (H, W),
        tile_h,
        tile_w,
        max_per_tile,
    )
    # per-tile face ids (F = sentinel -> degenerate dummy face)
    face_ids = jnp.concatenate(
        [binning.order, jnp.array([F], jnp.int32)]
    )[binning.tile_indices]  # (T, K) actual face indices, F = miss

    tri_pad = jnp.concatenate([tri, jnp.zeros((1, 3, 2))], axis=0)
    invz_pad = jnp.concatenate([inv_z[faces], jnp.ones((1, 3))], axis=0)

    # pixel centers per tile
    t_ids = jnp.arange(ny * nx, dtype=jnp.int32)
    ox = (t_ids % nx) * tile_w
    oy = (t_ids // nx) * tile_h
    px_local = jnp.broadcast_to(
        jnp.arange(tile_w, dtype=jnp.float32)[None, :] + 0.5, (tile_h, tile_w)
    )
    py_local = jnp.broadcast_to(
        jnp.arange(tile_h, dtype=jnp.float32)[:, None] + 0.5, (tile_h, tile_w)
    )
    # (T, P) pixel coords, P = tile_h * tile_w
    px = (ox[:, None, None] + px_local[None]).reshape(ny * nx, -1)
    py = (oy[:, None, None] + py_local[None]).reshape(ny * nx, -1)

    P = tile_h * tile_w
    chunk = 64

    def tile_body(fids, pxt, pyt):
        """fids: (K,), pxt/pyt: (P,) -> best (face, z, bary) per pixel."""
        K = fids.shape[0]
        n_ch = K // chunk

        def scan_body(carry, f_chunk):
            best_z, best_f = carry
            t = tri_pad[f_chunk]  # (c, 3, 2)
            iz = invz_pad[f_chunk]  # (c, 3)
            b0, b1, b2, area = _edge_bary(
                pxt[:, None], pyt[:, None], t[:, 0], t[:, 1], t[:, 2]
            )  # (P, c); area (c,)
            inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (jnp.abs(area)[None, :] > 1e-12)
            inside = inside & (f_chunk < F)[None, :]
            # perspective-correct depth: 1 / sum(b_i / z_i)
            invz_pix = b0 * iz[None, :, 0] + b1 * iz[None, :, 1] + b2 * iz[None, :, 2]
            zpix = 1.0 / jnp.maximum(invz_pix, 1e-12)
            zpix = jnp.where(inside, zpix, jnp.inf)
            zmin = jnp.min(zpix, axis=1)
            amin = jnp.argmin(zpix, axis=1)
            fwin = f_chunk[amin]
            better = zmin < best_z
            best_z = jnp.where(better, zmin, best_z)
            best_f = jnp.where(better, fwin, best_f)
            return (best_z, best_f), None

        init = (jnp.full((P,), jnp.inf), jnp.full((P,), -1, jnp.int32))
        (bz, bf), _ = jax.lax.scan(scan_body, init, fids.reshape(n_ch, chunk))
        return bz, bf

    # pad K to a chunk multiple
    K0 = face_ids.shape[1]
    padK = -K0 % chunk
    face_ids = jnp.pad(face_ids, ((0, 0), (0, padK)), constant_values=F)

    bz, bf = jax.lax.map(
        lambda args: tile_body(*args), (face_ids, px, py), batch_size=256
    )

    # assemble tiles -> image
    def tiles_to_img(x):
        x = x.reshape(ny, nx, tile_h, tile_w)
        return x.transpose(0, 2, 1, 3).reshape(ny * tile_h, nx * tile_w)[:H, :W]

    pix_face = tiles_to_img(bf).astype(jnp.int32)
    zbuf = tiles_to_img(bz)

    # differentiable barycentric recomputation for the winning face
    pj, pi = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        jnp.arange(H, dtype=jnp.float32) + 0.5,
    )
    sel = jnp.maximum(pix_face, 0)
    t = tri[sel]  # (H, W, 3, 2) differentiable w.r.t. verts
    b0, b1, b2, _ = _edge_bary(pj, pi, t[..., 0, :], t[..., 1, :], t[..., 2, :])
    iz = inv_z[faces][sel]  # (H, W, 3)
    # perspective correction: w_i ∝ b_i / z_i
    pw = jnp.stack([b0, b1, b2], axis=-1) * iz
    pw = pw / jnp.maximum(pw.sum(-1, keepdims=True), 1e-12)
    hit = (pix_face >= 0)[..., None]
    bary = jnp.where(hit, pw, 0.0)
    return MeshFragments(pix_to_face=pix_face, bary=bary, zbuf=zbuf)


def sample_uv_texture(
    uvmap: jnp.ndarray,
    fragments: MeshFragments,
    face_uv: jnp.ndarray,
    vertex_uv: jnp.ndarray,
    bg_value: float = -1.0,
) -> jnp.ndarray:
    """Sample a UV texture through fragments (TexturesUV equivalent).

    uvmap: (C, Ht, Wt); face_uv: (F, 3) indices into vertex_uv (Vt, 2),
    uv in [0, 1] with v=0 at texture row 0. Background pixels get
    ``bg_value`` (the reference marks them -1, layer.py:66-67).
    Returns (C, H, W).
    """
    H, W = fragments.pix_to_face.shape
    C = uvmap.shape[0]
    sel = jnp.maximum(fragments.pix_to_face, 0)
    uv_tri = vertex_uv[face_uv[sel]]  # (H, W, 3, 2)
    uv = jnp.einsum("hwk,hwkc->hwc", fragments.bary, uv_tri)  # (H, W, 2)
    # [0,1] -> [-1,1] grid coords, align_corners=False bilinear
    coords = uv.reshape(-1, 2) * 2.0 - 1.0
    vals = grid_sample_2d(uvmap, coords).reshape(H, W, C)
    hit = (fragments.pix_to_face >= 0)[..., None]
    out = jnp.where(hit, vals, bg_value)
    return out.transpose(2, 0, 1)


def render_textured_mesh(
    uvmap: jnp.ndarray,
    verts_world: jnp.ndarray,
    faces: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    img_shape: Tuple[int, int],
    face_uv: jnp.ndarray,
    vertex_uv: jnp.ndarray,
    max_per_tile: int = 512,
) -> jnp.ndarray:
    """Full MeshRenderer equivalent (reference avatar/common/nets/layer.py:39-68):
    world->camera transform, z-buffer raster, UV texture sample, -1 background.
    Returns (C, H, W)."""
    verts_cam = verts_world @ R.T + t[None, :]
    frags = rasterize_mesh(
        verts_cam, faces, focal, princpt, img_shape, max_per_tile=max_per_tile
    )
    return sample_uv_texture(uvmap, frags, face_uv, vertex_uv)
