"""Per-frame optimizable SMPL-X parameters, stored as 6D rotations.

Functional redesign of the reference ``SMPLXParamDict`` (reference
avatar/common/nets/module.py:649-684): instead of an nn.ParameterDict keyed
by stringified frame index, all frames live in stacked arrays — one pytree
node per parameter — so a frame lookup is a gather, the whole store is a
single optax leaf set, and frames batch with vmap.
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..core.rotations import (
    axis_angle_to_rotation_6d,
    rotation_6d_to_axis_angle,
)
from ..models.smplx.structs import NUM_BODY_JOINTS, NUM_HAND_JOINTS


@flax.struct.dataclass
class PosedSMPLXParams:
    """One frame in axis-angle (decoded view; no betas — identity shape
    lives with the human Gaussian params like the reference, module.py:291)."""

    root_pose: jnp.ndarray  # (3,)
    body_pose: jnp.ndarray  # (21, 3)
    jaw_pose: jnp.ndarray  # (3,)
    leye_pose: jnp.ndarray  # (3,)
    reye_pose: jnp.ndarray  # (3,)
    lhand_pose: jnp.ndarray  # (15, 3)
    rhand_pose: jnp.ndarray  # (15, 3)
    expr: jnp.ndarray  # (E,)
    trans: jnp.ndarray  # (3,)


@flax.struct.dataclass
class SMPLXParamFrames:
    """All frames, poses in 6D (the optimization representation the
    reference uses, module.py:657-663)."""

    root_pose: jnp.ndarray  # (F, 6)
    body_pose: jnp.ndarray  # (F, 21, 6)
    jaw_pose: jnp.ndarray  # (F, 6)
    leye_pose: jnp.ndarray  # (F, 6)
    reye_pose: jnp.ndarray  # (F, 6)
    lhand_pose: jnp.ndarray  # (F, 15, 6)
    rhand_pose: jnp.ndarray  # (F, 15, 6)
    expr: jnp.ndarray  # (F, E)
    trans: jnp.ndarray  # (F, 3)

    @property
    def num_frames(self) -> int:
        return self.root_pose.shape[0]

    def lookup(self, frame_row) -> PosedSMPLXParams:
        """Decode one frame (traced index OK) back to axis-angle
        (reference module.py:671-684)."""
        d6 = lambda x: rotation_6d_to_axis_angle(x)
        return PosedSMPLXParams(
            root_pose=d6(self.root_pose[frame_row]),
            body_pose=d6(self.body_pose[frame_row]),
            jaw_pose=d6(self.jaw_pose[frame_row]),
            leye_pose=d6(self.leye_pose[frame_row]),
            reye_pose=d6(self.reye_pose[frame_row]),
            lhand_pose=d6(self.lhand_pose[frame_row]),
            rhand_pose=d6(self.rhand_pose[frame_row]),
            expr=self.expr[frame_row],
            trans=self.trans[frame_row],
        )


def init_param_frames(per_frame_axis_angle: Sequence[Dict[str, np.ndarray]]) -> SMPLXParamFrames:
    """Encode a list of per-frame axis-angle parameter dicts
    (the fitting stage's smplx_params JSON payload) into the 6D store."""
    def stack(name, shape):
        return jnp.stack(
            [jnp.asarray(np.asarray(p[name], np.float32).reshape(shape)) for p in per_frame_axis_angle]
        )

    enc = axis_angle_to_rotation_6d
    return SMPLXParamFrames(
        root_pose=enc(stack("root_pose", (3,))),
        body_pose=enc(stack("body_pose", (NUM_BODY_JOINTS, 3))),
        jaw_pose=enc(stack("jaw_pose", (3,))),
        leye_pose=enc(stack("leye_pose", (3,))),
        reye_pose=enc(stack("reye_pose", (3,))),
        lhand_pose=enc(stack("lhand_pose", (NUM_HAND_JOINTS, 3))),
        rhand_pose=enc(stack("rhand_pose", (NUM_HAND_JOINTS, 3))),
        expr=stack("expr", (-1,)),
        trans=stack("trans", (3,)),
    )
