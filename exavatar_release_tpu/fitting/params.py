"""Optimizable fitting parameters + per-part weighting.

Mirrors the parameter registration of the reference fit loop (reference
fitting/main/fit.py:37-62): per-frame SMPL-X poses (root/body/hands, 6D) and
translations; per-frame FLAME poses; jaw/eye poses and expression SHARED
between the two models (single tensors); shared identity (SMPL-X shape,
FLAME shape, face/joint/locator offsets).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core.rotations import axis_angle_to_rotation_6d, rotation_6d_to_axis_angle
from ..models.smplx.structs import SMPLX_JOINT_NAMES

ROOT_IDX = SMPLX_JOINT_NAMES.index("Pelvis")
LHIP_IDX = SMPLX_JOINT_NAMES.index("L_Hip")
RHIP_IDX = SMPLX_JOINT_NAMES.index("R_Hip")


@flax.struct.dataclass
class FittingParams:
    """All optimizable state for a batch of F frames."""

    # per-frame SMPL-X (6D poses)
    smplx_root_pose: jnp.ndarray  # (F, 6)
    smplx_body_pose: jnp.ndarray  # (F, 21, 6)
    smplx_lhand_pose: jnp.ndarray  # (F, 15, 6)
    smplx_rhand_pose: jnp.ndarray  # (F, 15, 6)
    smplx_trans: jnp.ndarray  # (F, 3)
    # shared face params (used by BOTH models; reference fit.py:54-57)
    jaw_pose: jnp.ndarray  # (F, 6)
    leye_pose: jnp.ndarray  # (F, 6)
    reye_pose: jnp.ndarray  # (F, 6)
    expr: jnp.ndarray  # (F, E)
    # per-frame FLAME
    flame_root_pose: jnp.ndarray  # (F, 6)
    flame_neck_pose: jnp.ndarray  # (F, 6)
    flame_trans: jnp.ndarray  # (F, 3)
    # shared identity
    smplx_shape: jnp.ndarray  # (S,)
    flame_shape: jnp.ndarray  # (S,)
    face_offset: jnp.ndarray  # (V_flame, 3) on FLAME-correspondence verts
    joint_offset: jnp.ndarray  # (J, 3)
    locator_offset: jnp.ndarray  # (J, 3)


def init_fitting_params(
    smplx_init: Sequence[Dict[str, np.ndarray]],
    flame_init: Sequence[Dict[str, np.ndarray]],
    flame_shape: np.ndarray,
    num_shape: int,
    num_flame_verts: int,
    num_joints: int,
) -> FittingParams:
    """Encode initial per-frame estimates (Hand4Whole / DECA outputs, the
    same JSON payloads the reference datasets load)."""
    enc = axis_angle_to_rotation_6d

    def s(key, shape):
        return jnp.stack(
            [jnp.asarray(np.asarray(p[key], np.float32).reshape(shape)) for p in smplx_init]
        )

    def f(key, shape):
        return jnp.stack(
            [jnp.asarray(np.asarray(p[key], np.float32).reshape(shape)) for p in flame_init]
        )

    E = np.asarray(flame_init[0]["expr"]).reshape(-1).shape[0]
    return FittingParams(
        smplx_root_pose=enc(s("root_pose", (3,))),
        smplx_body_pose=enc(s("body_pose", (21, 3))),
        smplx_lhand_pose=enc(s("lhand_pose", (15, 3))),
        smplx_rhand_pose=enc(s("rhand_pose", (15, 3))),
        smplx_trans=s("trans", (3,)),
        jaw_pose=enc(f("jaw_pose", (3,))),
        leye_pose=enc(f("leye_pose", (3,))),
        reye_pose=enc(f("reye_pose", (3,))),
        expr=f("expr", (E,)),
        flame_root_pose=enc(f("root_pose", (3,))),
        flame_neck_pose=enc(f("neck_pose", (3,))),
        flame_trans=f("trans", (3,)),
        smplx_shape=jnp.zeros((num_shape,)),
        flame_shape=jnp.asarray(np.asarray(flame_shape, np.float32).reshape(-1)),
        face_offset=jnp.zeros((num_flame_verts, 3)),
        joint_offset=jnp.zeros((num_joints, 3)),
        locator_offset=jnp.zeros((num_joints, 3)),
    )


def pad_face_offset(face_offset: jnp.ndarray, face_vertex_idx: jnp.ndarray,
                    num_vertices: int) -> jnp.ndarray:
    """Scatter FLAME-correspondence offsets into the full SMPL-X vertex set
    (reference smpl_x.get_face_offset, fitting smpl_x.py:84-88)."""
    full = jnp.zeros((num_vertices, 3), face_offset.dtype)
    return full.at[face_vertex_idx].set(face_offset)


def weight_joint_offset(joint_offset: jnp.ndarray) -> jnp.ndarray:
    """Zero root + both hips (reference fitting smpl_x.get_joint_offset,
    :90-96 — hips are handled by the locator offset instead)."""
    return (
        joint_offset.at[ROOT_IDX].set(0.0)
        .at[LHIP_IDX].set(0.0)
        .at[RHIP_IDX].set(0.0)
    )


def weight_locator_offset(locator_offset: jnp.ndarray) -> jnp.ndarray:
    """Keep ONLY the hips (reference get_locator_offset, :98-103)."""
    out = jnp.zeros_like(locator_offset)
    out = out.at[LHIP_IDX].set(locator_offset[LHIP_IDX])
    out = out.at[RHIP_IDX].set(locator_offset[RHIP_IDX])
    return out


def stage_mask_tree(params: FittingParams, root_only, allow_shared) -> FittingParams:
    """Gradient-mask pytree implementing the reference's stage-dependent
    optimizer membership (fit.py:73-96) as multiplicative masks:
    root_only -> only root poses + translations; allow_shared gates the
    shared identity params (frozen in the final epoch)."""
    one = jnp.asarray(1.0)
    zero = jnp.asarray(0.0)
    per_frame = jnp.where(root_only, zero, one)
    shared = jnp.where(root_only, zero, jnp.where(allow_shared, one, zero))
    return FittingParams(
        smplx_root_pose=one, smplx_trans=one,
        flame_root_pose=one, flame_trans=one,
        smplx_body_pose=per_frame, smplx_lhand_pose=per_frame,
        smplx_rhand_pose=per_frame,
        jaw_pose=per_frame, leye_pose=per_frame, reye_pose=per_frame,
        expr=per_frame, flame_neck_pose=per_frame,
        smplx_shape=shared, flame_shape=shared, face_offset=shared,
        joint_offset=shared, locator_offset=shared,
    )
