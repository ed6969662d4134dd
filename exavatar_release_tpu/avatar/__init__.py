"""TPU-native ExAvatar: scene + human Gaussians, renderer, losses, model.

Functional redesign of the reference avatar half (reference avatar/):
pytree state, pure forwards, fixed-capacity scene buffers, one jitted
train step (see train/).
"""
from .config import AvatarConfig
from .gaussians import GaussianAssets, concat_assets, detach_assets
from . import scene
from .human import (
    HumanBuffers,
    HumanForwardOut,
    HumanParams,
    clamp_warmup_scale,
    extract_tri_feature,
    human_forward,
    init_human,
    neutral_pose_human,
    zero_pose_joints,
)
from .param_dict import PosedSMPLXParams, SMPLXParamFrames, init_param_frames

__all__ = [
    "AvatarConfig",
    "GaussianAssets",
    "concat_assets",
    "detach_assets",
    "scene",
    "HumanBuffers",
    "HumanForwardOut",
    "HumanParams",
    "clamp_warmup_scale",
    "extract_tri_feature",
    "human_forward",
    "init_human",
    "neutral_pose_human",
    "zero_pose_joints",
    "PosedSMPLXParams",
    "SMPLXParamFrames",
    "init_param_frames",
]
