"""SMPL-X / FLAME video fitting (preprocessing half of the framework).

Functional redesign of the reference ``fitting/`` half: per-frame SMPL-X +
FLAME parameters, shared identity offsets, 2D-keypoint reprojection losses,
staged inner optimization — all as pure pytree state + one jitted Adam step
(the reference rebuilds a torch Adam per stage, fitting/common/base.py:47-48;
here stages are traced gradient masks, so one compiled step serves all
stages).
"""
from .config import FittingConfig
from .keypoints import (
    SMPLX_KPT_IDX,
    SMPLX_KPT_NAMES,
    KPT_PART_IDX,
    full_keypoints,
)
from .params import FittingParams, init_fitting_params
from .model import fitting_forward, FitFrameData
from .fit import (
    FitState,
    fit_step,
    init_fit_state,
    make_fit_optimizer,
    reinit_opt_on_stage_change,
    stage_flags,
)

__all__ = [
    "FittingConfig",
    "SMPLX_KPT_IDX",
    "SMPLX_KPT_NAMES",
    "KPT_PART_IDX",
    "full_keypoints",
    "FittingParams",
    "init_fitting_params",
    "fitting_forward",
    "FitFrameData",
    "FitState",
    "fit_step",
    "init_fit_state",
    "make_fit_optimizer",
    "reinit_opt_on_stage_change",
    "stage_flags",
]
