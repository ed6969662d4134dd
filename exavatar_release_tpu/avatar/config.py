"""Immutable avatar configuration.

Replaces the reference's mutable Config singleton (reference
avatar/main/config.py:5-89 — mutated per-iteration via set_stage and at
import time). Here: one frozen dataclass, hashable, safe as a jit static
argument; stage flags (warmup, SH degree) are computed from the iteration
number by pure functions in the train loop instead of mutating globals.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class AvatarConfig:
    # triplane (reference config.py:8-10)
    triplane_shape_3d: Tuple[float, float, float] = (2.0, 2.0, 2.0)
    triplane_face_shape_3d: Tuple[float, float, float] = (0.3, 0.3, 0.3)
    triplane_ch: int = 32
    triplane_res: int = 128

    # train schedule (reference config.py:13-32)
    lr: float = 1e-3
    end_epoch: int = 5
    max_sh_degree: int = 3
    increase_sh_degree_interval: int = 1000
    densify_end_itr: int = 15000
    densify_start_itr: int = 500
    densify_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_grad_thr: float = 0.0002
    opacity_min: float = 0.005
    dense_percent_thr: float = 0.01
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scale_lr: float = 0.005
    rotation_lr: float = 0.001
    warmup_itr: int = 100
    smplx_param_lr: float = 1e-4  # 1e-3 when fitting pose to test frames

    # loss weights (reference config.py:34-37)
    rgb_loss_weight: float = 0.8
    ssim_loss_weight: float = 0.2
    lpips_weight: float = 0.2
    # LPIPS runs on a fixed-size window centered on the human bbox (clamped
    # to the image). The reference crops the dynamic bbox before LPIPS
    # (model.py:217-257); a dynamic SIZE is impossible under jit, and
    # full-image LPIPS at 1080p pads the conv's NHWC input (minor dim 3 ->
    # 128 lanes) into multi-GB temps. Window >= image falls back to full.
    lpips_crop_h: int = 768
    lpips_crop_w: int = 512
    # The face mesh render covers a small screen region; rendering the full
    # frame makes the z-buffer raster sweep every tile (~1 s/step at 1080p
    # measured on v5e). A static window centered on the projected face,
    # embedded back at -1 background via dynamic_update_slice, is exact as
    # long as the face fits the window. Window >= image falls back to full.
    face_render_h: int = 512
    face_render_w: int = 512

    # fixed-capacity scene buffer (TPU static shapes; the reference grows
    # tensors dynamically instead, module.py:159-251)
    scene_capacity: int = 1 << 17

    def is_warmup(self, itr: int) -> bool:
        return itr < self.warmup_itr

    def sh_degree_at(self, itr: int) -> int:
        return min(itr // self.increase_sh_degree_interval, self.max_sh_degree)
