"""Avatar model: composition of scene/human Gaussians, renders, losses.

Functional equivalent of the reference ``Model`` (reference
avatar/main/model.py:12-316): per frame it produces six renders (scene /
human over random background / scene+human / the two refined variants /
textured face mesh) and ~20 weighted loss terms. Redesigned for TPU:

* one pure ``forward_frame`` that jits whole; batching is vmap (the
  reference hard-caps batch_size=1 and loops in Python, config.py:44-45);
* the screen-space mean gradient needed for densification flows through an
  explicit ``scene_mean2d_offset`` argument — the train step takes
  d(loss)/d(offset) instead of mutating ``.grad`` on a retained leaf
  (reference train.py:49-54);
* dynamic bbox crops and part-vertex selections become masks / static index
  lists (see losses.py).
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..models.smplx.prior import SMPLXIDInfo, SMPLXPrior
from ..models.smplx.structs import SMPLX_JOINT_NAMES
from ..ops.image_metrics import bbox_mask
from ..ops.lpips import LPIPSParams
from ..ops.mesh_raster import render_textured_mesh
from ..ops.rasterizer.api import RasterizeSettings, rasterize
from . import losses as L
from . import scene as sc
from .config import AvatarConfig
from .gaussians import GaussianAssets, concat_assets, detach_assets
from .human import (
    HumanBuffers,
    HumanParams,
    clamp_warmup_scale,
    human_forward,
)
from .param_dict import SMPLXParamFrames


@flax.struct.dataclass
class AvatarTrainables:
    """The complete optimizable pytree (optax operates on this)."""

    scene: sc.SceneParams
    human: HumanParams
    frames: SMPLXParamFrames


class FrameData(NamedTuple):
    """One training frame (reference dataset __getitem__ payload,
    avatar/data/NeuMan/NeuMan.py:130-147)."""

    img: jnp.ndarray  # (3, H, W) in [0, 1]
    mask: jnp.ndarray  # (1, H, W) human fg mask
    bbox: jnp.ndarray  # (4,) xmin, ymin, w, h
    cam: Camera
    frame_row: jnp.ndarray  # () int — row in SMPLXParamFrames


class AvatarStatics(NamedTuple):
    """Trace-time constants resolved at model build (numpy / python)."""

    lap_idx: np.ndarray  # (V_hr, 10)
    lap_w: np.ndarray  # (V_hr, 10)
    right_joint_idx: np.ndarray
    left_joint_idx: np.ndarray
    upper_arm_idx: np.ndarray  # static arm index lists
    lower_arm_idx: np.ndarray
    joint_offset_weight: np.ndarray  # (J, 3): 1, hands 10 (model.py:253-255)
    mean_reg_w: np.ndarray  # (V_hr,) weight maps (model.py:217-247)
    scale_reg_w: np.ndarray
    lap_mean_w: np.ndarray
    lap_scale_w: np.ndarray
    lap_rgb_w: np.ndarray
    face_vertex_idx: np.ndarray  # (V_face,) low-res SMPLX<->FLAME table
    face_faces: np.ndarray  # (F_face, 3) triangles over face_vertex order
    face_vertex_uv: np.ndarray  # (Vt, 2)
    face_face_uv: np.ndarray  # (F_face, 3)


def build_statics(
    prior: SMPLXPrior,
    buffers: HumanBuffers,
    face_faces: np.ndarray,
    face_vertex_uv: np.ndarray,
    face_face_uv: np.ndarray,
) -> AvatarStatics:
    """Precompute all static tables.

    ``face_faces`` is the FLAME triangle list over ``prior.face_vertex_idx``
    order (the reference renders flame.face over
    mean_3d[smpl_x.face_vertex_idx], model.py:170-175).
    """
    V_hr = prior.vertex_num_upsampled
    lap_idx, lap_w = L.build_laplacian_neighbors(
        np.asarray(prior.faces_upsampled), V_hr
    )
    right_idx, left_idx = L.symmetric_joint_pairs()

    is_rhand = np.asarray(buffers.is_rhand)
    is_lhand = np.asarray(buffers.is_lhand)
    is_face = np.asarray(buffers.is_face)
    is_face_expr = np.asarray(buffers.is_face_expr)
    is_cavity = np.asarray(buffers.is_cavity)

    # arm split from the template neutral mesh at build time (the reference
    # recomputes the upper/lower split per-iteration from the evolving
    # neutral mesh, model.py:250 + smpl_x.get_arm — normals move negligibly
    # under identity offsets, and the assignment is non-differentiable, so a
    # static split is the jit-stable equivalent)
    from ..core.geometry import vertex_normals

    normal = np.asarray(
        vertex_normals(buffers.pos_enc_mesh, prior.faces_upsampled)
    )
    part = np.asarray(buffers.skinning_weight).argmax(1)
    arm_joints = [SMPLX_JOINT_NAMES.index(n)
                  for n in ("R_Shoulder", "R_Elbow", "L_Shoulder", "L_Elbow")]
    is_arm = np.isin(part, arm_joints)
    thr = math.cos(math.pi / 3.0)
    upper = np.where(is_arm & (normal[:, 1] > thr))[0]
    lower = np.where(is_arm & (normal[:, 1] <= thr))[0]
    if upper.size == 0:
        upper = np.asarray([0], np.int64)
    if lower.size == 0:
        lower = np.asarray([0], np.int64)

    # weight maps, sequential overwrites as in model.py:217-247
    def wmap(base, assigns):
        w = np.full((V_hr,), float(base), np.float32)
        for mask, val in assigns:
            w[mask] = val
        return w

    mean_reg_w = wmap(10.0, [(is_rhand, 1000), (is_lhand, 1000), (is_face, 1), (is_face_expr, 10)])
    scale_reg_w = wmap(1.0, [(is_rhand, 1000), (is_lhand, 1000), (is_face_expr, 10), (is_cavity, 0)])
    lap_mean_w = wmap(1.0, [(is_face_expr, 50), (is_cavity, 0.1)])
    lap_scale_w = wmap(10.0, [(is_rhand, 10), (is_lhand, 10), (is_face_expr, 0)])
    lap_rgb_w = wmap(0.1, [(is_rhand, 100), (is_lhand, 100)])

    J = prior.joint_num
    jw = np.ones((J, 3), np.float32)
    from ..models.smplx.prior import JOINT_PART

    jw[list(JOINT_PART["lhand"])] = 10.0
    jw[list(JOINT_PART["rhand"])] = 10.0

    return AvatarStatics(
        lap_idx=lap_idx,
        lap_w=lap_w,
        right_joint_idx=right_idx,
        left_joint_idx=left_idx,
        upper_arm_idx=upper.astype(np.int32),
        lower_arm_idx=lower.astype(np.int32),
        joint_offset_weight=jw,
        mean_reg_w=mean_reg_w,
        scale_reg_w=scale_reg_w,
        lap_mean_w=lap_mean_w,
        lap_scale_w=lap_scale_w,
        lap_rgb_w=lap_rgb_w,
        face_vertex_idx=np.asarray(prior.face_vertex_idx, np.int64),
        face_faces=np.asarray(face_faces, np.int32),
        face_vertex_uv=np.asarray(face_vertex_uv, np.float32),
        face_face_uv=np.asarray(face_face_uv, np.int32),
    )


class ForwardOutputs(NamedTuple):
    renders: Dict[str, jnp.ndarray]
    losses: Dict[str, jnp.ndarray]
    scene_radius: jnp.ndarray  # (C,) densify stats of the scene render
    scene_is_vis: jnp.ndarray  # (C,)
    # (gaussian, tile) pairs lost to static binning capacities, summed over
    # this frame's renders — the loop logs nonzero values (a silently
    # cropped footprint during warmup is a quality + broken-gradient bug)
    # and the capacity governor grows the matching knob on sustained drops:
    # dropped_pairs -> pairs_per_gaussian budget; truncated -> max_per_tile
    raster_dropped: object = None
    raster_dropped_pairs: object = None
    raster_truncated: object = None
    # gaussian-shard exchange bucket overflow (settings.gaussian_shard);
    # mitigated by growing settings.exchange_cap
    raster_exchange_overflow: object = None


def forward_frame(
    trainables: AvatarTrainables,
    scene_aux: sc.SceneAux,
    buffers: HumanBuffers,
    prior: SMPLXPrior,
    statics: AvatarStatics,
    id_info: SMPLXIDInfo,
    lpips_params: LPIPSParams,
    face_texture: jnp.ndarray,  # (3, Ht, Wt)
    face_texture_mask: jnp.ndarray,  # (1, Ht, Wt)
    init_joint_offset: jnp.ndarray,  # (J, 3) fitting-stage value
    frame: FrameData,
    bg: jnp.ndarray,  # (3,) human-render background (random in train)
    cfg: AvatarConfig,
    is_warmup: bool,
    mode: str = "train",
    fit_pose_to_test: bool = False,
    settings: RasterizeSettings = RasterizeSettings(),
    scene_mean2d_offset: Optional[jnp.ndarray] = None,
) -> ForwardOutputs:
    """One frame through the full model (reference Model.forward,
    avatar/main/model.py:60-277)."""
    H, W = int(frame.img.shape[1]), int(frame.img.shape[2])
    cam = frame.cam
    scene_state = sc.SceneState(trainables.scene, scene_aux)

    # ---- assets ------------------------------------------------------------
    scene_asset = sc.scene_assets(scene_state, cam.R, cam.t)
    smplx_param = trainables.frames.lookup(frame.frame_row)
    hout = human_forward(
        trainables.human, buffers, prior, smplx_param, id_info,
        cam.R, cam.t, cfg,
    )
    if mode == "train" and is_warmup:
        hout = clamp_warmup_scale(hout)
    human_asset, human_asset_ref = hout.assets, hout.assets_refined

    scene_human = concat_assets(detach_assets(scene_asset), human_asset)
    scene_human_ref = concat_assets(detach_assets(scene_asset), human_asset_ref)

    # ---- renders -----------------------------------------------------------
    ones_bg = jnp.ones((3,))

    def render(assets: GaussianAssets, bg_color, mean2d_offset=None):
        return rasterize(
            assets.mean_3d, assets.scale, assets.rotation, assets.opacity,
            assets.rgb, assets.live, cam, (H, W), bg_color, settings,
            mean2d_offset=mean2d_offset,
        )

    scene_render = render(scene_asset, ones_bg, scene_mean2d_offset)
    human_render = render(human_asset, bg)
    scene_human_render = render(scene_human, ones_bg)
    human_render_ref = render(human_asset_ref, bg)
    scene_human_render_ref = render(scene_human_ref, ones_bg)

    # face mesh render: FLAME-topology mesh over the posed face vertices
    # (reference model.py:169-175)
    uvmap = jnp.concatenate([face_texture, face_texture_mask], axis=0)
    fv = statics.face_vertex_idx

    frh = min(cfg.face_render_h, H)
    frw = min(cfg.face_render_w, W)
    if frh < H or frw < W:
        # window origin from the projected face center (shared by both the
        # base and refined assets — they differ in rgb only, not geometry)
        fverts = jax.lax.stop_gradient(human_asset.mean_3d[fv])
        vc = fverts @ cam.R.T + cam.t[None, :]
        fz = jnp.maximum(vc[:, 2], 1e-4)
        fpx = jnp.mean(vc[:, 0] / fz * cam.focal[0] + cam.princpt[0])
        fpy = jnp.mean(vc[:, 1] / fz * cam.focal[1] + cam.princpt[1])
        fcy = jnp.clip((fpy - frh * 0.5).astype(jnp.int32), 0, H - frh)
        fcx = jnp.clip((fpx - frw * 0.5).astype(jnp.int32), 0, W - frw)
        princpt_w = cam.princpt - jnp.stack(
            [fcx.astype(jnp.float32), fcy.astype(jnp.float32)]
        )
    else:
        fcy = fcx = None
        princpt_w = cam.princpt

    def face_render_of(asset):
        patch = render_textured_mesh(
            uvmap, asset.mean_3d[fv], jnp.asarray(statics.face_faces),
            cam.R, cam.t, cam.focal, princpt_w, (frh, frw),
            jnp.asarray(statics.face_face_uv), jnp.asarray(statics.face_vertex_uv),
        )
        if fcy is None:
            return patch
        # embed at the reference's -1 background (sample_uv_texture fills
        # ALL channels with -1) — exact as long as the face projects inside
        # the window (see AvatarConfig)
        base = jnp.full((patch.shape[0], H, W), -1.0, patch.dtype)
        return jax.lax.dynamic_update_slice(base, patch, (0, fcy, fcx))

    face_render = face_render_of(human_asset)
    face_render_ref = face_render_of(human_asset_ref)

    renders = {
        "scene_img": scene_render["img"],
        "human_img": human_render["img"],
        "human_mask": human_render["mask"],
        "scene_human_img": scene_human_render["img"],
        "human_img_refined": human_render_ref["img"],
        "human_mask_refined": human_render_ref["mask"],
        "scene_human_img_refined": scene_human_render_ref["img"],
        "face_render": face_render,
        "face_render_refined": face_render_ref,
    }

    if mode != "train":
        out = dict(renders)
        # composited outputs (reference model.py:259-277)
        def face_compose(base, fr):
            is_face = (fr[:3] != -1).astype(jnp.float32) * fr[3:4]
            return base * (1 - is_face) + fr[:3] * is_face

        # renders are (H, W, 3); face renders are (C, H, W)
        hw3 = lambda chw: chw.transpose(1, 2, 0)
        out["human_face_img"] = hw3(
            face_compose(renders["human_img"].transpose(2, 0, 1), face_render)
        )
        out["human_face_img_refined"] = hw3(
            face_compose(
                renders["human_img_refined"].transpose(2, 0, 1), face_render_ref
            )
        )
        is_fg = (human_render["mask"] > 0.9).astype(jnp.float32)[..., None]
        out["scene_human_img_composed"] = (
            is_fg * human_render["img"] + (1 - is_fg) * scene_human_render["img"]
        )
        is_fg = (human_render_ref["mask"] > 0.9).astype(jnp.float32)[..., None]
        out["scene_human_img_refined_composed"] = (
            is_fg * human_render_ref["img"] + (1 - is_fg) * scene_human_render_ref["img"]
        )
        return ForwardOutputs(out, {}, scene_render["radius"], scene_render["is_vis"])

    # ---- losses ------------------------------------------------------------
    all_renders = (scene_render, human_render, scene_human_render,
                   human_render_ref, scene_human_render_ref)
    dropped = sum(r.get("n_dropped", 0) for r in all_renders)
    dropped_pairs = sum(r.get("n_dropped_pairs", 0) for r in all_renders)
    truncated = sum(r.get("n_truncated", 0) for r in all_renders)
    xovf = sum(r.get("exchange_overflow", 0) for r in all_renders)
    # all images as (3, H, W)
    img_t = frame.img
    mask_t = frame.mask
    region = bbox_mask((H, W), frame.bbox)
    chw = lambda hwc: hwc.transpose(2, 0, 1)

    losses: Dict[str, jnp.ndarray] = {}
    sh_img = chw(scene_human_render["img"])
    sh_img_ref = chw(scene_human_render_ref["img"])

    # LPIPS window: fixed-size crop centered on the bbox (see AvatarConfig)
    lch = min(cfg.lpips_crop_h, H)
    lcw = min(cfg.lpips_crop_w, W)
    lcy = jnp.clip(
        (frame.bbox[1] + frame.bbox[3] * 0.5 - lch * 0.5).astype(jnp.int32),
        0, H - lch,
    )
    lcx = jnp.clip(
        (frame.bbox[0] + frame.bbox[2] * 0.5 - lcw * 0.5).astype(jnp.int32),
        0, W - lcw,
    )
    crop3 = lambda im: jax.lax.dynamic_slice(im, (0, lcy, lcx), (3, lch, lcw))
    crop2 = lambda m: jax.lax.dynamic_slice(m, (lcy, lcx), (lch, lcw))
    img_t_lcrop = crop3(img_t)
    region_lcrop = crop2(region)

    losses["rgb_human"] = L.rgb_l1(sh_img, img_t, region) * cfg.rgb_loss_weight
    losses["ssim_human"] = L.ssim_loss(sh_img, img_t, region) * cfg.ssim_loss_weight
    losses["lpips_human"] = L.lpips_loss(
        lpips_params, crop3(sh_img), img_t_lcrop, region_lcrop
    ) * cfg.lpips_weight

    def face_composite_loss(base_img, fr):
        is_face = ((fr[:3] != -1.0).astype(jnp.float32) * (fr[3:4] == 1.0)).astype(
            jnp.float32
        )
        composed = base_img * (1 - is_face) + fr[:3] * is_face
        return L.rgb_l1(composed, img_t, region) * cfg.rgb_loss_weight

    losses["rgb_face"] = face_composite_loss(sh_img, face_render)
    losses["rgb_human_rand_bg"] = L.rgb_l1(
        chw(human_render["img"]), img_t, region, fg_mask=mask_t, bg=bg
    )

    losses["rgb_human_refined"] = L.rgb_l1(sh_img_ref, img_t, region) * cfg.rgb_loss_weight
    losses["ssim_human_refined"] = L.ssim_loss(sh_img_ref, img_t, region) * cfg.ssim_loss_weight
    losses["lpips_human_refined"] = (
        L.lpips_loss(lpips_params, crop3(sh_img_ref), img_t_lcrop, region_lcrop)
        * cfg.lpips_weight
    )
    losses["rgb_face_refined"] = face_composite_loss(sh_img_ref, face_render_ref)
    losses["rgb_human_refined_rand_bg"] = L.rgb_l1(
        chw(human_render_ref["img"]), img_t, region, fg_mask=mask_t, bg=bg
    )

    if fit_pose_to_test:
        return ForwardOutputs(
            renders, losses, scene_render["radius"], scene_render["is_vis"],
            raster_dropped=dropped, raster_dropped_pairs=dropped_pairs,
            raster_truncated=truncated, raster_exchange_overflow=xovf,
        )

    losses["rgb_scene"] = (
        L.rgb_l1_weighted_full(chw(scene_render["img"]), img_t, 1.0 - mask_t)
        * cfg.rgb_loss_weight
    )
    losses["ssim_scene"] = (
        L.ssim_loss(chw(scene_render["img"]), img_t, mul_mask=1.0 - mask_t)
        * cfg.ssim_loss_weight
    )

    mw = jnp.asarray(statics.mean_reg_w)[:, None]
    losses["gaussian_mean_reg"] = jnp.mean(
        (hout.mean_offset ** 2 + hout.mean_offset_offset ** 2) * mw
    )
    is_hand = buffers.is_rhand | buffers.is_lhand
    losses["gaussian_mean_hand_reg"] = L.hand_mean_reg(
        hout.mesh_neutral_pose, hout.mean_offset, prior.faces_upsampled, is_hand
    ) + L.hand_mean_reg(
        hout.mesh_neutral_pose, hout.mean_offset_offset, prior.faces_upsampled, is_hand
    )

    sw = jnp.asarray(statics.scale_reg_w)[:, None]
    scale_for_reg = hout.scale_wo_clamp if is_warmup else human_asset.scale
    losses["gaussian_scale_reg"] = jnp.mean(
        (scale_for_reg ** 2 + hout.scale_offset ** 2) * sw
    )

    lap_idx = jnp.asarray(statics.lap_idx)
    lap_w = jnp.asarray(statics.lap_w)
    neutral_sg = jax.lax.stop_gradient(hout.mesh_neutral_pose)
    # all seven laplacian operands ride ONE neighbor gather (losses.
    # laplacian_multi); identical math to per-operand laplacian_reg calls
    (l_m1, l_m2, l_n, l_s, l_sr, l_r, l_rr) = L.laplacian_multi(
        [
            neutral_sg + hout.mean_offset,
            neutral_sg + hout.mean_offset + hout.mean_offset_offset,
            neutral_sg,
            human_asset.scale,
            human_asset_ref.scale,
            human_asset.rgb,
            human_asset_ref.rgb,
        ],
        lap_idx,
        lap_w,
    )

    def _lap_wmean(lap, wmap_):
        return jnp.mean(lap ** 2 * wmap_[:, None])

    lap_mean_w = jnp.asarray(statics.lap_mean_w)
    lap_scale_w = jnp.asarray(statics.lap_scale_w)
    lap_rgb_w = jnp.asarray(statics.lap_rgb_w)
    losses["lap_mean"] = (
        _lap_wmean(l_m1 - l_n, lap_mean_w) + _lap_wmean(l_m2 - l_n, lap_mean_w)
    ) * 100000.0
    losses["lap_scale"] = (
        _lap_wmean(l_s, lap_scale_w) + _lap_wmean(l_sr, lap_scale_w)
    ) * 100000.0
    losses["lap_rgb"] = _lap_wmean(l_r, lap_rgb_w) + _lap_wmean(l_rr, lap_rgb_w)

    losses["hand_rgb_reg"] = (
        L.hand_rgb_reg(human_asset.rgb, buffers.is_rhand, buffers.is_lhand)
        + L.hand_rgb_reg(human_asset_ref.rgb, buffers.is_rhand, buffers.is_lhand)
    ) * 0.01
    losses["arm_rgb_reg"] = (
        L.arm_rgb_reg(
            hout.mesh_neutral_pose, jnp.asarray(statics.upper_arm_idx),
            jnp.asarray(statics.lower_arm_idx), human_asset.rgb,
        )
        + L.arm_rgb_reg(
            hout.mesh_neutral_pose, jnp.asarray(statics.upper_arm_idx),
            jnp.asarray(statics.lower_arm_idx), human_asset_ref.rgb,
        )
    ) * 0.1

    losses["joint_offset_reg"] = jnp.mean(
        (trainables.human.joint_offset - init_joint_offset) ** 2
        * jnp.asarray(statics.joint_offset_weight)
    )
    losses["joint_offset_sym_reg"] = L.joint_offset_symmetric_reg(
        trainables.human.joint_offset,
        jnp.asarray(statics.right_joint_idx),
        jnp.asarray(statics.left_joint_idx),
    )

    return ForwardOutputs(
        renders, losses, scene_render["radius"], scene_render["is_vis"],
        raster_dropped=dropped, raster_dropped_pairs=dropped_pairs,
        raster_truncated=truncated, raster_exchange_overflow=xovf,
    )


def total_loss(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum of mean loss terms (reference train.py:43-46)."""
    return sum(jnp.asarray(v) for v in losses.values())
