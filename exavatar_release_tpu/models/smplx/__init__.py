"""TPU-native SMPL-X/FLAME parametric body models (pure JAX, no torch).

Re-designed equivalent of the reference's vendored-and-modified ``smplx``
package (reference avatar/common/utils/smplx/smplx/{body_models,lbs}.py) and
the ``smpl_x`` prior singleton (reference avatar/common/utils/smpl_x.py).
Everything is a pytree of arrays + pure functions, so the whole body model
fwd traces into one XLA program (batched via vmap, sharded via shard_map).
"""
from .structs import (
    NUM_BODY_JOINTS,
    NUM_HAND_JOINTS,
    SMPLX_JOINT_NAMES,
    SMPLX_NECK_KIN_CHAIN,
    SMPLX_PARENTS,
    SMPLXAssets,
    SMPLXOutput,
    SMPLXParams,
)
from .lbs import (
    blend_shapes,
    lbs,
    rigid_transform,
    skin_vertices,
    vertices_to_joints,
    vertices_to_landmarks,
)
from .model import smplx_forward
from .subdivide import (
    SubdivisionOp,
    build_subdivision,
    midpoint_subdivide,
    upsample_features,
)
from .assets_io import load_smplx_assets, synthetic_smplx_assets
from .prior import (
    JOINT_PART,
    ROOT_JOINT_IDX,
    SMPLXIDInfo,
    SMPLXPrior,
    build_prior,
    load_prior_tables,
)

__all__ = [
    "NUM_BODY_JOINTS",
    "NUM_HAND_JOINTS",
    "SMPLX_JOINT_NAMES",
    "SMPLX_NECK_KIN_CHAIN",
    "SMPLX_PARENTS",
    "SMPLXAssets",
    "SMPLXOutput",
    "SMPLXParams",
    "blend_shapes",
    "lbs",
    "rigid_transform",
    "skin_vertices",
    "vertices_to_joints",
    "vertices_to_landmarks",
    "smplx_forward",
    "SubdivisionOp",
    "build_subdivision",
    "midpoint_subdivide",
    "upsample_features",
    "load_smplx_assets",
    "synthetic_smplx_assets",
    "JOINT_PART",
    "ROOT_JOINT_IDX",
    "SMPLXIDInfo",
    "SMPLXPrior",
    "build_prior",
    "load_prior_tables",
]

from .flame import (
    FLAME_JOINT_NAMES,
    FLAME_PARENTS,
    FLAMEParams,
    FLAMEPrior,
    flame_forward,
    load_flame_assets,
    load_flame_uv,
    synthetic_flame_assets,
)

__all__ += [
    "FLAME_JOINT_NAMES",
    "FLAME_PARENTS",
    "FLAMEParams",
    "FLAMEPrior",
    "flame_forward",
    "load_flame_assets",
    "load_flame_uv",
    "synthetic_flame_assets",
]
