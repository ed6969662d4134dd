"""Linear blend skinning core: blend shapes, FK, skinning, landmarks.

Semantics match the reference's modified smplx LBS (reference
avatar/common/utils/smplx/smplx/lbs.py:156-264 and 361-417, including the
``joint_offset``/``locator_offset`` extensions), re-expressed as pure,
single-sample JAX functions — batching is the caller's ``vmap``, so the
whole body model traces into one fused XLA program.

TPU notes: the heavy ops are the (V*3, S+E) and (P, V*3) matmuls of the
blend-shape bases — kept as single large ``jnp.matmul`` so XLA tiles them on
the MXU. FK over the J=55 kinematic tree is unrolled at trace time against
the static ``parents`` tuple (55 tiny 4x4 matmuls; no dynamic control flow).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ...core.rotations import axis_angle_to_matrix

_mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def blend_shapes(coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex displacement from blendshape coefficients.

    coeffs: (C,), dirs: (V, 3, C) -> (V, 3). (Reference lbs.py:287-308.)
    Contracted as one (V*3, C) @ (C,) matvec for the MXU.
    """
    V = dirs.shape[0]
    return _mm(dirs.reshape(V * 3, -1), coeffs).reshape(V, 3)


def vertices_to_joints(joint_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) @ (V, 3) -> (J, 3). (Reference lbs.py:267-284.)"""
    return _mm(joint_regressor, vertices)


def rigid_transform(
    rot_mats: jnp.ndarray,
    joints: jnp.ndarray,
    parents: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics over the joint tree.

    rot_mats: (J, 3, 3) local joint rotations; joints: (J, 3) rest positions;
    parents: static tuple, parents[0] == -1.

    Returns (posed_joints (J, 3), rel_transforms (J, 4, 4)) where
    rel_transforms are the skinning matrices A with the rest-pose joint
    location subtracted (reference lbs.py:361-417).
    """
    J = len(parents)
    parent_idx = np.asarray(parents[1:], dtype=np.int32)
    rel = jnp.concatenate([joints[:1], joints[1:] - joints[parent_idx]], axis=0)
    # local transforms [[R, rel_j], [0, 1]]
    top = jnp.concatenate([rot_mats, rel[:, :, None]], axis=2)  # (J, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], joints.dtype), (J, 1, 4)
    )
    local = jnp.concatenate([top, bottom], axis=1)  # (J, 4, 4)

    # unrolled chain: parents is static, so this traces to J-1 4x4 matmuls
    chain = [local[0]]
    for i in range(1, J):
        chain.append(_mm(chain[parents[i]], local[i]))
    transforms = jnp.stack(chain, axis=0)  # (J, 4, 4)

    posed_joints = transforms[:, :3, 3]
    # A = T - [[0, T_rot @ j], [0, 0]]: subtract rest-pose joint location
    tj = jnp.einsum("jab,jb->ja", transforms[:, :3, :3], joints)
    rel_transforms = transforms.at[:, :3, 3].add(-tj)
    return posed_joints, rel_transforms


def lbs(
    shape_coeffs: jnp.ndarray,
    full_pose: jnp.ndarray,
    v_template: jnp.ndarray,
    shapedirs: jnp.ndarray,
    posedirs: jnp.ndarray,
    joint_regressor: jnp.ndarray,
    parents: Sequence[int],
    lbs_weights: jnp.ndarray,
    joint_offset: Optional[jnp.ndarray] = None,
    locator_offset: Optional[jnp.ndarray] = None,
    pose2rot: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shape + pose-corrective + FK + skinning (reference lbs.py:156-264).

    shape_coeffs: (C,) concatenated [betas, expr]; full_pose: (J, 3) axis-angle
    (or (J, 3, 3) rotation matrices when pose2rot=False); joint_offset /
    locator_offset: (J, 3) or None. locator_offset shifts only the *reported*
    joints, never the skinning chain (reference lbs.py:245-247).

    Returns (vertices (V, 3), posed_joints (J, 3), rel_transforms (J, 4, 4)).
    """
    v_shaped = v_template + blend_shapes(shape_coeffs, shapedirs)
    joints = vertices_to_joints(joint_regressor, v_shaped)
    if joint_offset is not None:
        joints = joints + joint_offset

    if pose2rot:
        rot_mats = axis_angle_to_matrix(full_pose)  # (J, 3, 3)
    else:
        rot_mats = full_pose

    # pose-corrective blendshapes from non-root rotations
    ident = jnp.eye(3, dtype=v_template.dtype)
    pose_feature = (rot_mats[1:] - ident).reshape(-1)  # (9*(J-1),)
    pose_offsets = _mm(pose_feature, posedirs).reshape(-1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = rigid_transform(rot_mats, joints, parents)
    if locator_offset is not None:
        posed_joints, _ = rigid_transform(
            rot_mats, joints + locator_offset, parents
        )

    verts = skin_vertices(v_posed, lbs_weights, A)
    return verts, posed_joints, A


def skin_vertices(
    v_posed: jnp.ndarray, lbs_weights: jnp.ndarray, A: jnp.ndarray
) -> jnp.ndarray:
    """Blend skinning transforms and apply to vertices.

    v_posed: (V, 3); lbs_weights: (V, J); A: (J, 4, 4) -> (V, 3).
    The per-vertex transform blend is a (V, J) @ (J, 12) MXU matmul
    (reference lbs.py:249-262 uses J x 16; the bottom row is constant).
    """
    J = A.shape[0]
    T = _mm(lbs_weights, A[:, :3, :].reshape(J, 12)).reshape(-1, 3, 4)
    return jnp.einsum("vij,vj->vi", T[:, :, :3], v_posed) + T[:, :, 3]


def vertices_to_landmarks(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    lmk_faces_idx: jnp.ndarray,
    lmk_bary_coords: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric landmark interpolation (reference lbs.py:108-153).

    vertices: (V, 3); faces: (F, 3); lmk_faces_idx: (L,); bary: (L, 3).
    """
    tri = vertices[faces[lmk_faces_idx]]  # (L, 3, 3)
    return jnp.einsum("lfi,lf->li", tri, lmk_bary_coords)


def neck_yaw_bucket(
    rot_mats: jnp.ndarray, neck_kin_chain: Sequence[int]
) -> jnp.ndarray:
    """LUT row index for the dynamic contour landmarks.

    Composes the neck kinematic chain rotations, extracts the y-Euler angle,
    and maps it to an index in [0, 78] exactly as the reference does
    (reference lbs.py:30-105: clamp to 39°, negatives offset to 39-angle,
    < -39° saturates at row 78).
    """
    rel = jnp.eye(3, dtype=rot_mats.dtype)
    for idx in neck_kin_chain:
        rel = _mm(rot_mats[idx], rel)
    # rot_mat_to_euler (reference smplx utils): atan2(-R[2,0], sqrt(R[0,0]²+R[1,0]²))
    sy = jnp.sqrt(rel[0, 0] * rel[0, 0] + rel[1, 0] * rel[1, 0])
    yaw = jnp.arctan2(-rel[2, 0], sy)
    deg = jnp.round(jnp.clip(-yaw * 180.0 / jnp.pi, max=39.0))
    neg = deg < 0
    sat = deg < -39.0
    neg_vals = jnp.where(sat, 78.0, 39.0 - deg)
    return jnp.where(neg, neg_vals, deg).astype(jnp.int32)
