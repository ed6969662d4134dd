"""Pytree structures for the SMPL-X / FLAME body models.

Re-designed equivalent of the reference's torch ``nn.Module`` body models
(reference avatar/common/utils/smplx/smplx/body_models.py): instead of a
stateful module holding buffers, assets are an immutable flax.struct pytree of
arrays plus static (non-traced) topology metadata, and the forward pass is a
pure function (see model.py). Static metadata (kinematic parents, counts)
lives outside the traced leaves so FK unrolls at trace time with no dynamic
control flow — the XLA-friendly formulation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class SMPLXAssets:
    """SMPL-X model data. Array fields are pytree leaves (jit-traversable).

    Shapes use V = vertex count (10475 real), J = joint count (55),
    S = shape dims (100), E = expression dims (50), P = 9*(J-1).
    ``shapedirs``/``expr_dirs`` are kept separate so FLAME expression
    grafting (reference avatar/common/utils/smpl_x.py:56-59) is a pure
    row-replacement on ``expr_dirs``.
    """

    v_template: jnp.ndarray  # (V, 3)
    shapedirs: jnp.ndarray  # (V, 3, S)
    expr_dirs: jnp.ndarray  # (V, 3, E)
    posedirs: jnp.ndarray  # (P, V*3) — pose-corrective basis, P = 9*(J-1)
    joint_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    pose_mean: jnp.ndarray  # (J*3,) axis-angle added to full pose
    #   (hands mean when flat_hand_mean=False; reference body_models.py
    #   create_mean_pose — zeros except the two 45-dim hand blocks)
    faces: jnp.ndarray  # (F, 3) int32 triangle indices
    # static landmark embedding (68-pt face subset without contour)
    lmk_faces_idx: jnp.ndarray  # (L,) int32
    lmk_bary_coords: jnp.ndarray  # (L, 3)
    # dynamic contour landmark LUT, indexed by neck yaw in [-39°, 39°]
    dyn_lmk_faces_idx: jnp.ndarray  # (79, 17) int32
    dyn_lmk_bary_coords: jnp.ndarray  # (79, 17, 3)

    # --- static (non-traced) topology metadata ---
    parents: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    neck_kin_chain: Tuple[int, ...] = flax.struct.field(pytree_node=False)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def num_shape(self) -> int:
        return self.shapedirs.shape[-1]

    @property
    def num_expr(self) -> int:
        return self.expr_dirs.shape[-1]


# SMPL-X joint layout (reference avatar/common/utils/smpl_x.py:33-45)
SMPLX_JOINT_NAMES: Tuple[str, ...] = (
    "Pelvis", "L_Hip", "R_Hip", "Spine_1", "L_Knee", "R_Knee", "Spine_2",
    "L_Ankle", "R_Ankle", "Spine_3", "L_Foot", "R_Foot", "Neck", "L_Collar",
    "R_Collar", "Head", "L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow",
    "L_Wrist", "R_Wrist",
    "Jaw", "L_Eye", "R_Eye",
    "L_Index_1", "L_Index_2", "L_Index_3", "L_Middle_1", "L_Middle_2",
    "L_Middle_3", "L_Pinky_1", "L_Pinky_2", "L_Pinky_3", "L_Ring_1",
    "L_Ring_2", "L_Ring_3", "L_Thumb_1", "L_Thumb_2", "L_Thumb_3",
    "R_Index_1", "R_Index_2", "R_Index_3", "R_Middle_1", "R_Middle_2",
    "R_Middle_3", "R_Pinky_1", "R_Pinky_2", "R_Pinky_3", "R_Ring_1",
    "R_Ring_2", "R_Ring_3", "R_Thumb_1", "R_Thumb_2", "R_Thumb_3",
)

# Kinematic tree of the standard SMPL-X skeleton (data constant of the model
# family; matches kintree_table of the released SMPL-X 1.1 assets).
SMPLX_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 15, 15,  # jaw, leye, reye <- head
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,  # left hand
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,  # right hand
)

# Joints on the neck->head chain used for the dynamic-contour LUT
# (reference smplx body_models.py neck_kin_chain: head(15)->neck(12)->...->0).
SMPLX_NECK_KIN_CHAIN: Tuple[int, ...] = (15, 12, 9, 6, 3, 0)

NUM_BODY_JOINTS = 21  # body joints excluding pelvis/root
NUM_HAND_JOINTS = 15


@flax.struct.dataclass
class SMPLXParams:
    """One frame of SMPL-X parameters, axis-angle rotations (no batch dim —
    batching is the caller's vmap). Mirrors the argument surface of the
    reference SMPLX.forward (body_models.py:1123-1141)."""

    betas: jnp.ndarray  # (S,)
    expr: jnp.ndarray  # (E,)
    root_pose: jnp.ndarray  # (3,)
    body_pose: jnp.ndarray  # (21, 3)
    jaw_pose: jnp.ndarray  # (3,)
    leye_pose: jnp.ndarray  # (3,)
    reye_pose: jnp.ndarray  # (3,)
    lhand_pose: jnp.ndarray  # (15, 3)
    rhand_pose: jnp.ndarray  # (15, 3)
    trans: jnp.ndarray  # (3,)

    @staticmethod
    def zeros(num_shape: int = 100, num_expr: int = 50, dtype=jnp.float32) -> "SMPLXParams":
        return SMPLXParams(
            betas=jnp.zeros((num_shape,), dtype),
            expr=jnp.zeros((num_expr,), dtype),
            root_pose=jnp.zeros((3,), dtype),
            body_pose=jnp.zeros((NUM_BODY_JOINTS, 3), dtype),
            jaw_pose=jnp.zeros((3,), dtype),
            leye_pose=jnp.zeros((3,), dtype),
            reye_pose=jnp.zeros((3,), dtype),
            lhand_pose=jnp.zeros((NUM_HAND_JOINTS, 3), dtype),
            rhand_pose=jnp.zeros((NUM_HAND_JOINTS, 3), dtype),
            trans=jnp.zeros((3,), dtype),
        )

    def full_pose(self) -> jnp.ndarray:
        """(J, 3) axis-angle in model joint order (reference
        body_models.py:1222-1229 concatenation order == joint order)."""
        return jnp.concatenate(
            [
                self.root_pose.reshape(1, 3),
                self.body_pose.reshape(NUM_BODY_JOINTS, 3),
                self.jaw_pose.reshape(1, 3),
                self.leye_pose.reshape(1, 3),
                self.reye_pose.reshape(1, 3),
                self.lhand_pose.reshape(NUM_HAND_JOINTS, 3),
                self.rhand_pose.reshape(NUM_HAND_JOINTS, 3),
            ],
            axis=0,
        )


@flax.struct.dataclass
class SMPLXOutput:
    """Forward-pass outputs (reference SMPLXOutput, body_models.py)."""

    vertices: jnp.ndarray  # (V, 3) posed, translated
    joints: jnp.ndarray  # (J, 3) posed joints (with locator offset if given)
    landmarks: Optional[jnp.ndarray]  # (L(+17), 3) face landmarks or None
    v_shaped: jnp.ndarray  # (V, 3) template + shape blendshapes (no expr)
    joints_zero_pose: jnp.ndarray  # (J, 3) rest joints used by FK
    rel_transforms: jnp.ndarray  # (J, 4, 4) FK skinning transforms A


def np_faces(faces) -> np.ndarray:
    return np.asarray(faces, dtype=np.int32)
