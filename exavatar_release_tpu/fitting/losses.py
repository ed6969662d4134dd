"""Fitting losses (reference fitting/common/nets/loss.py), pure JAX.

All per-frame logic (the reference's Python loop over the batch in
CoordLoss, loss.py:54-71) is vectorized so the whole loss stack vmaps over
frames inside one jitted step.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rotations import axis_angle_to_matrix
from .keypoints import KPT_PART_IDX, SMPLX_KPT_NAMES

_LWRIST = SMPLX_KPT_NAMES.index("L_Wrist")
_RWRIST = SMPLX_KPT_NAMES.index("R_Wrist")


def _kpt_bbox(kpt: jnp.ndarray, valid: jnp.ndarray, extend: float = 1.2):
    """[xmin, ymin, w, h] of valid keypoints, extended (reference
    loss.py:13-27). kpt: (K, 2); valid: (K, 1)."""
    v = valid[:, 0] > 0
    big = 1e9
    x = jnp.where(v, kpt[:, 0], big)
    y = jnp.where(v, kpt[:, 1], big)
    xmin = jnp.min(x)
    ymin = jnp.min(y)
    x2 = jnp.where(v, kpt[:, 0], -big)
    y2 = jnp.where(v, kpt[:, 1], -big)
    xmax = jnp.max(x2)
    ymax = jnp.max(y2)
    cx = (xmin + xmax) / 2.0
    cy = (ymin + ymax) / 2.0
    w = (xmax - xmin) * extend
    h = (ymax - ymin) * extend
    return jnp.stack([cx - w / 2.0, cy - h / 2.0, w, h])


def _bbox_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """IoU of [x, y, w, h] boxes (reference loss.py:29-46)."""
    x1a, y1a, x2a, y2a = b1[0], b1[1], b1[0] + b1[2], b1[1] + b1[3]
    x1b, y1b, x2b, y2b = b2[0], b2[1], b2[0] + b2[2], b2[1] + b2[3]
    xi = jnp.maximum(x1a, x1b)
    yi = jnp.maximum(y1a, y1b)
    xa = jnp.minimum(x2a, x2b)
    ya = jnp.minimum(y2a, y2b)
    inter = jnp.maximum(xa - xi, 0.0) * jnp.maximum(ya - yi, 0.0)
    a1 = (x2a - x1a) * (y2a - y1a)
    a2 = (x2b - x1b) * (y2b - y1b)
    return inter / (a1 + a2 - inter + 1e-5)


def hand_occlusion_weight(
    kpt_proj: jnp.ndarray, kpt_valid: jnp.ndarray, kpt_cam: jnp.ndarray
) -> jnp.ndarray:
    """(K, 1) weight zeroing the farther hand when L/R hand boxes overlap
    (IoU > 0.5) — detectors confuse overlapping hands (reference
    loss.py:54-71). Single frame; vmap over the batch."""
    l_idx = jnp.asarray(KPT_PART_IDX["lhand"])
    r_idx = jnp.asarray(KPT_PART_IDX["rhand"])
    lv = kpt_valid[l_idx]
    rv = kpt_valid[r_idx]
    has_both = (jnp.sum(lv) > 0) & (jnp.sum(rv) > 0)
    lb = _kpt_bbox(kpt_proj[l_idx], lv)
    rb = _kpt_bbox(kpt_proj[r_idx], rv)
    iou = _bbox_iou(lb, rb)
    l_farther = jnp.mean(kpt_cam[l_idx, 2]) > jnp.mean(kpt_cam[r_idx, 2])
    drop = has_both & (iou > 0.5)

    w = jnp.ones((kpt_proj.shape[0],))
    drop_l = drop & l_farther
    drop_r = drop & ~l_farther
    w = w.at[l_idx].set(jnp.where(drop_l, 0.0, w[l_idx]))
    w = w.at[_LWRIST].set(jnp.where(drop_l, 0.0, w[_LWRIST]))
    w = w.at[r_idx].set(jnp.where(drop_r, 0.0, w[r_idx]))
    w = w.at[_RWRIST].set(jnp.where(drop_r, 0.0, w[_RWRIST]))
    return jax.lax.stop_gradient(w[:, None])


def coord_loss(
    kpt_proj: jnp.ndarray,
    kpt_proj_gt: jnp.ndarray,
    kpt_valid: jnp.ndarray,
    kpt_cam: jnp.ndarray,
) -> jnp.ndarray:
    """|proj - gt| * valid * occlusion weight (reference CoordLoss.forward,
    loss.py:73-75). Single frame (K, 2)."""
    w = hand_occlusion_weight(kpt_proj, kpt_valid, jax.lax.stop_gradient(kpt_cam))
    return jnp.abs(kpt_proj - kpt_proj_gt) * kpt_valid * w


def pose_loss(pose_out_aa: jnp.ndarray, pose_gt_aa: jnp.ndarray) -> jnp.ndarray:
    """|R(out) - R(gt)| elementwise (reference PoseLoss, loss.py:77-91)."""
    return jnp.abs(
        axis_angle_to_matrix(pose_out_aa) - axis_angle_to_matrix(pose_gt_aa)
    )


def edge_length_loss(
    coord_out: jnp.ndarray,
    coord_gt: jnp.ndarray,
    valid: jnp.ndarray,
    faces: jnp.ndarray,
) -> jnp.ndarray:
    """|edge lengths out - gt| on valid edges (reference EdgeLengthLoss,
    loss.py:120-146). Single mesh (V, 3); valid (V, 1)."""
    def lengths(c):
        a = c[faces[:, 0]]
        b = c[faces[:, 1]]
        d = c[faces[:, 2]]
        e1 = jnp.sqrt(jnp.sum((a - b) ** 2, 1, keepdims=True) + 1e-12)
        e2 = jnp.sqrt(jnp.sum((a - d) ** 2, 1, keepdims=True) + 1e-12)
        e3 = jnp.sqrt(jnp.sum((b - d) ** 2, 1, keepdims=True) + 1e-12)
        return e1, e2, e3

    o1, o2, o3 = lengths(coord_out)
    g1, g2, g3 = lengths(coord_gt)
    v1 = valid[faces[:, 0]] * valid[faces[:, 1]]
    v2 = valid[faces[:, 0]] * valid[faces[:, 2]]
    v3 = valid[faces[:, 1]] * valid[faces[:, 2]]
    return jnp.concatenate(
        [jnp.abs(o1 - g1) * v1, jnp.abs(o2 - g2) * v2, jnp.abs(o3 - g3) * v3], axis=0
    )


def face_offset_symmetric_reg(
    face_offset: jnp.ndarray,
    face_vertex_idx: jnp.ndarray,
    num_vertices: int,
    flip_closest_faces: jnp.ndarray,  # (V, 3) vertex ids of mirror triangle
    flip_bc: jnp.ndarray,  # (V, 3) barycentric weights
) -> jnp.ndarray:
    """Mirror-symmetry of the face offset through the SMPL-X flip
    correspondence (reference FaceOffsetSymmetricReg, loss.py:148-167):
    x anti-symmetric, y/z symmetric, evaluated on the face vertices."""
    full = jnp.zeros((num_vertices, 3), face_offset.dtype)
    full = full.at[face_vertex_idx].set(face_offset)
    flipped = jnp.einsum("vkc,vk->vc", full[flip_closest_faces], flip_bc)
    loss = (
        jnp.abs(full[:, 0] + flipped[:, 0])
        + jnp.abs(full[:, 1] - flipped[:, 1])
        + jnp.abs(full[:, 2] - flipped[:, 2])
    )
    return loss[face_vertex_idx]


def synthetic_flip_correspondence(v_template: np.ndarray,
                                  faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mirror correspondence for synthetic meshes (the real one ships as
    smplx_flip_correspondences.npz): nearest vertex to the x-mirrored
    position, as a degenerate (v, v, v) triangle with bc (1, 0, 0)."""
    mirrored = v_template * np.asarray([-1.0, 1.0, 1.0])
    d = ((mirrored[:, None, :] - v_template[None, :, :]) ** 2).sum(-1)
    nearest = d.argmin(1)
    closest_faces = np.stack([nearest] * 3, axis=1).astype(np.int32)
    bc = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (v_template.shape[0], 1))
    return closest_faces, bc
