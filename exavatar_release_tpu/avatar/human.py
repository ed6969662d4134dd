"""Human (SMPL-X-anchored) Gaussians: triplane + MLP heads + LBS posing.

Functional redesign of the reference ``HumanGaussian`` module (reference
avatar/common/nets/module.py:274-586). Optimizable state is a pytree
(``HumanParams``); precomputed upsampled-template tables are a separate
``HumanBuffers`` pytree built once at init. The forward pass is a pure
function of (params, buffers, prior, frame smplx params, camera), fully
jit/vmap-able — no per-frame Python, no CUDA-style buffer mutation.

Heavy ops map to TPU structure: triplane reads are bilinear gathers, all
MLP heads are (V_hr, C) MXU matmuls over ~167k rows, skinning is a
(V_hr, J) @ (J, 12) matmul, KNN runs through the chunked MXU KNN op.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..core.geometry import vertex_normals
from ..core.rotations import (
    axis_angle_to_matrix,
    axis_angle_to_rotation_6d,
    matrix_to_quaternion,
)
from ..models.smplx.lbs import rigid_transform
from ..models.smplx.model import smplx_forward
from ..models.smplx.prior import JOINT_PART, SMPLXIDInfo, SMPLXPrior
from ..models.smplx.structs import SMPLXAssets, SMPLXParams
from ..nn import MLPParams, apply_mlp, init_mlp
from ..ops.grid_sample import triplane_sample
from ..ops.knn import knn
from .config import AvatarConfig
from .gaussians import GaussianAssets
from .param_dict import PosedSMPLXParams


@flax.struct.dataclass
class HumanParams:
    """Optimizable human-avatar parameters (reference module.py:277-292)."""

    triplane: jnp.ndarray  # (3, C, H, W)
    triplane_face: jnp.ndarray  # (3, C, H, W)
    geo_net: MLPParams  # [3C, 128, 128, 128] gn
    mean_offset_net: MLPParams  # [128, 3]
    scale_net: MLPParams  # [128, 1]
    geo_offset_net: MLPParams  # [3C + 21*6, 128, 128, 128] gn
    mean_offset_offset_net: MLPParams  # [128, 3]
    scale_offset_net: MLPParams  # [128, 1]
    rgb_net: MLPParams  # [3C, 128, 128, 128, 3] gn
    rgb_offset_net: MLPParams  # [3C + 21*6 + 3, 128, 128, 128, 3] gn
    shape_param: jnp.ndarray  # (S,)
    joint_offset: jnp.ndarray  # (J, 3)


@flax.struct.dataclass
class HumanBuffers:
    """Upsampled-template tables (reference HumanGaussian.init,
    module.py:293-318), all at V_hr rows."""

    pos_enc_mesh: jnp.ndarray  # (V_hr, 3) 大-pose mesh, no id info, open jaw
    skinning_weight: jnp.ndarray  # (V_hr, J)
    pose_dirs: jnp.ndarray  # ((J-1)*9, V_hr*3)
    expr_dirs: jnp.ndarray  # (V_hr, 3, E)
    is_rhand: jnp.ndarray  # (V_hr,) bool
    is_lhand: jnp.ndarray
    is_face: jnp.ndarray
    is_face_expr: jnp.ndarray
    is_cavity: jnp.ndarray


class HumanForwardOut(NamedTuple):
    assets: GaussianAssets
    assets_refined: GaussianAssets
    mean_offset: jnp.ndarray  # (V_hr, 3)
    mean_offset_offset: jnp.ndarray  # (V_hr, 3)
    scale_offset: jnp.ndarray  # (V_hr, 1)
    rgb_offset: jnp.ndarray  # (V_hr, 3)
    mesh_neutral_pose: jnp.ndarray  # (V_hr, 3)
    scale_wo_clamp: jnp.ndarray  # (V_hr, 3) pre-warmup-clamp scale
    scale_refined_wo_clamp: jnp.ndarray


def init_human(
    key: jax.Array,
    prior: SMPLXPrior,
    id_info: SMPLXIDInfo,
    cfg: AvatarConfig,
) -> Tuple[HumanParams, HumanBuffers]:
    """Build params (zero triplanes, torch-default MLP inits; reference
    module.py:277-291) and the upsampled buffers (module.py:293-318)."""
    assets = prior.assets
    C = cfg.triplane_ch
    R = cfg.triplane_res
    n_body = len(JOINT_PART["body"]) - 1  # 21
    ks = jax.random.split(key, 8)
    params = HumanParams(
        triplane=jnp.zeros((3, C, R, R)),
        triplane_face=jnp.zeros((3, C, R, R)),
        geo_net=init_mlp(ks[0], [C * 3, 128, 128, 128], use_gn=True),
        mean_offset_net=init_mlp(ks[1], [128, 3], relu_final=False),
        scale_net=init_mlp(ks[2], [128, 1], relu_final=False),
        geo_offset_net=init_mlp(ks[3], [C * 3 + n_body * 6, 128, 128, 128], use_gn=True),
        mean_offset_offset_net=init_mlp(ks[4], [128, 3], relu_final=False),
        scale_offset_net=init_mlp(ks[5], [128, 1], relu_final=False),
        rgb_net=init_mlp(ks[6], [C * 3, 128, 128, 128, 3], relu_final=False, use_gn=True),
        rgb_offset_net=init_mlp(
            ks[7], [C * 3 + n_body * 6 + 3, 128, 128, 128, 3], relu_final=False, use_gn=True
        ),
        shape_param=id_info.shape_param,
        joint_offset=id_info.joint_offset,
    )

    # position-encoding mesh: 大 pose with OPEN jaw, no identity info
    mesh_hr, _, _, _ = neutral_pose_human(
        prior, None, None, jaw_zero_pose=False
    )
    J = assets.num_joints
    V = assets.num_vertices
    E = assets.num_expr
    up = prior.upsample_mesh
    pose_dirs_v = jnp.asarray(assets.posedirs).T.reshape(V, 3 * (J - 1) * 9)
    pose_dirs_hr = up(pose_dirs_v)
    V_hr = prior.vertex_num_upsampled
    pose_dirs_hr = pose_dirs_hr.reshape(V_hr * 3, (J - 1) * 9).T
    buffers = HumanBuffers(
        pos_enc_mesh=mesh_hr,
        skinning_weight=up(assets.lbs_weights),
        pose_dirs=pose_dirs_hr,
        expr_dirs=up(assets.expr_dirs.reshape(V, 3 * E)).reshape(V_hr, 3, E),
        is_rhand=prior.is_rhand_hr,
        is_lhand=prior.is_lhand_hr,
        is_face=prior.is_face_hr,
        is_face_expr=prior.is_face_expr_hr,
        is_cavity=prior.is_cavity_hr,
    )
    return params, buffers


def _smplx_params_for(
    prior: SMPLXPrior,
    body_pose: jnp.ndarray,
    jaw_pose: jnp.ndarray,
    shape_param: Optional[jnp.ndarray],
) -> SMPLXParams:
    assets = prior.assets
    z = SMPLXParams.zeros(assets.num_shape, assets.num_expr)
    return z.replace(
        body_pose=body_pose,
        jaw_pose=jaw_pose,
        betas=shape_param if shape_param is not None else z.betas,
    )


def neutral_pose_human(
    prior: SMPLXPrior,
    shape_param: Optional[jnp.ndarray],
    id_info: Optional[SMPLXIDInfo],
    jaw_zero_pose: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """大-pose human + the 大->zero FK transforms (reference
    get_neutral_pose_human, module.py:337-369).

    Returns (mesh_hr, mesh_lr, joints_neutral, transform_mat_neutral_pose).
    """
    assets = prior.assets
    jaw = jnp.zeros((3,)) if jaw_zero_pose else prior.neutral_jaw_pose
    params = _smplx_params_for(prior, prior.neutral_body_pose, jaw, shape_param)
    face_offset = id_info.face_offset if id_info is not None else None
    joint_offset = (
        prior.apply_joint_offset_weight(id_info.joint_offset)
        if id_info is not None
        else None
    )
    out = smplx_forward(
        assets, params, face_offset=face_offset, joint_offset=joint_offset,
        with_landmarks=False,
    )
    mesh_lr = out.vertices
    mesh_hr = prior.upsample_mesh(mesh_lr)
    joints_neutral = out.joints

    # FK of the INVERSE 大 pose at the 大-posed joints -> 大->zero transforms
    # (reference module.py:360-368; raw poses, no pose_mean)
    n_body = prior.neutral_body_pose.shape[0]
    inv_body = jnp.transpose(axis_angle_to_matrix(prior.neutral_body_pose), (0, 2, 1))
    inv_jaw = jnp.transpose(axis_angle_to_matrix(jaw), (1, 0))[None]
    eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    hands = jnp.broadcast_to(jnp.eye(3), (15, 3, 3))
    pose_mats = jnp.concatenate(
        [eye, inv_body, inv_jaw, eye, eye, hands, hands], axis=0
    )
    _, transform_mat = rigid_transform(pose_mats, joints_neutral, assets.parents)
    return mesh_hr, mesh_lr, joints_neutral, transform_mat


def zero_pose_joints(prior: SMPLXPrior, shape_param: jnp.ndarray,
                     id_info: SMPLXIDInfo) -> jnp.ndarray:
    """Zero-pose joint locations with identity info (reference
    get_zero_pose_human, module.py:371-387). Runs the full forward so the
    hand-mean pose (flat_hand_mean=False) shifts hand joints exactly as the
    reference layer does."""
    assets = prior.assets
    params = SMPLXParams.zeros(assets.num_shape, assets.num_expr).replace(
        betas=shape_param
    )
    out = smplx_forward(
        assets, params,
        face_offset=id_info.face_offset,
        joint_offset=prior.apply_joint_offset_weight(id_info.joint_offset),
        with_landmarks=False,
    )
    return out.joints


def extract_tri_feature(
    params: HumanParams, buffers: HumanBuffers, cfg: AvatarConfig
) -> jnp.ndarray:
    """Triplane features of all upsampled vertices; face vertices read the
    dedicated face triplane (reference extract_tri_feature,
    module.py:424-457)."""
    xyz = buffers.pos_enc_mesh
    center = jnp.mean(xyz, axis=0, keepdims=True)
    half = jnp.asarray(cfg.triplane_shape_3d) / 2.0
    feat = triplane_sample(params.triplane, xyz - center, half)

    is_face = buffers.is_face
    face_w = is_face.astype(jnp.float32)[:, None]
    face_center = jnp.sum(xyz * face_w, axis=0, keepdims=True) / jnp.maximum(
        jnp.sum(face_w), 1.0
    )
    half_face = jnp.asarray(cfg.triplane_face_shape_3d) / 2.0
    feat_face = triplane_sample(params.triplane_face, xyz - face_center, half_face)
    return jnp.where(is_face[:, None], feat_face, feat)


def _body_pose_6d_flat(smplx_param: PosedSMPLXParams) -> jnp.ndarray:
    return axis_angle_to_rotation_6d(smplx_param.body_pose).reshape(-1)


def get_mean_offset_offset(
    buffers: HumanBuffers,
    smplx_param: PosedSMPLXParams,
    regressed: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine regressed pose-dependent offsets with SMPL-X posedirs
    correctives: hands/expressive-face vertices use the analytic SMPL-X
    offsets, everything else the regressed ones (reference
    get_mean_offset_offset, module.py:473-493)."""
    pose_aa = jnp.concatenate(
        [
            smplx_param.body_pose,
            smplx_param.jaw_pose[None],
            smplx_param.leye_pose[None],
            smplx_param.reye_pose[None],
            smplx_param.lhand_pose,
            smplx_param.rhand_pose,
        ],
        axis=0,
    )  # (J-1, 3)
    pose_feat = (axis_angle_to_matrix(pose_aa) - jnp.eye(3)).reshape(-1)
    pose_feat = jax.lax.stop_gradient(pose_feat)
    smplx_pose_offset = jnp.matmul(
        pose_feat, buffers.pose_dirs, preferred_element_type=jnp.float32
    ).reshape(-1, 3)

    mask = (
        buffers.is_rhand | buffers.is_lhand | buffers.is_face_expr
    ).astype(jnp.float32)[:, None]
    regressed = regressed * (1.0 - mask)
    combined = regressed + smplx_pose_offset * mask
    return combined, regressed


def human_forward(
    params: HumanParams,
    buffers: HumanBuffers,
    prior: SMPLXPrior,
    smplx_param: PosedSMPLXParams,
    id_info: SMPLXIDInfo,
    cam_R: jnp.ndarray,
    cam_t: jnp.ndarray,
    cfg: AvatarConfig,
    is_world_coord: bool = False,
    knn_chunk: int = 4096,
) -> HumanForwardOut:
    """Full human-Gaussian forward (reference HumanGaussian.forward,
    module.py:516-586).

    ``smplx_param`` poses are in CAMERA coordinates (per-frame fitted);
    outputs are world-space unless ``is_world_coord``. Identity shape /
    joint offsets come from ``params`` (optimized), face offset from
    ``id_info``.
    """
    assets = prior.assets
    V_hr = prior.vertex_num_upsampled
    run_id = SMPLXIDInfo(
        shape_param=params.shape_param,
        face_offset=id_info.face_offset,
        joint_offset=params.joint_offset,
        locator_offset=id_info.locator_offset,
    )

    mesh_neutral_hr, mesh_neutral_lr, _, T_neutral = neutral_pose_human(
        prior, params.shape_param, run_id, jaw_zero_pose=True
    )
    joints_zero = zero_pose_joints(prior, params.shape_param, run_id)

    tri_feat = extract_tri_feature(params, buffers, cfg)

    # geometry heads
    geo_feat = apply_mlp(params.geo_net, tri_feat, use_gn=True)
    mean_offset = apply_mlp(params.mean_offset_net, geo_feat, relu_final=False)
    scale_raw = apply_mlp(params.scale_net, geo_feat, relu_final=False)
    rgb_raw = apply_mlp(params.rgb_net, tri_feat, relu_final=False, use_gn=True)
    mean_3d = mesh_neutral_hr + mean_offset  # 大 pose

    # pose-dependent geometry heads (body pose input, detached)
    pose6d = jax.lax.stop_gradient(_body_pose_6d_flat(smplx_param))
    pose_tiled = jnp.broadcast_to(pose6d[None, :], (V_hr, pose6d.shape[0]))
    geo_off_feat = apply_mlp(
        params.geo_offset_net, jnp.concatenate([tri_feat, pose_tiled], axis=1),
        use_gn=True,
    )
    mean_offset_offset = apply_mlp(
        params.mean_offset_offset_net, geo_off_feat, relu_final=False
    )
    scale_offset = apply_mlp(params.scale_offset_net, geo_off_feat, relu_final=False)

    # exp-overflow guard (deviation from reference module.py:525, which
    # would overflow to inf identically in torch): a raw log-scale past 10
    # (= 22 km Gaussians) is already divergent garbage, but inf scales turn
    # the scale regularizer loss inf -> gradients inf -> params nan in ONE
    # step; the clamp keeps the regularizer finite so training recovers.
    scale = jnp.exp(jnp.minimum(scale_raw, 10.0)).repeat(3, axis=1)
    scale_refined = jnp.exp(
        jnp.minimum(scale_raw + scale_offset, 10.0)
    ).repeat(3, axis=1)

    mean_combined_offset, mean_offset_offset = get_mean_offset_offset(
        buffers, smplx_param, mean_offset_offset
    )
    mean_3d_refined = mean_3d + mean_combined_offset

    # facial expression blendshape offset (reference module.py:537-539)
    expr_offset = jnp.einsum("e,vce->vc", smplx_param.expr, buffers.expr_dirs)
    mean_3d = mean_3d + expr_offset
    mean_3d_refined = mean_3d_refined + expr_offset

    # nearest low-res template vertex -> skinning weights; hands/face keep
    # their own vertex (reference module.py:541-546; lr_idx_to_hr_idx = id)
    nn_idx = knn(
        jax.lax.stop_gradient(mean_3d), jax.lax.stop_gradient(mesh_neutral_lr),
        k=1, chunk=knn_chunk,
    ).idx[:, 0]
    own = buffers.is_rhand | buffers.is_lhand | buffers.is_face
    nn_idx = jnp.where(own, jnp.arange(V_hr, dtype=jnp.int32), nn_idx)

    # FK transform chain: 大 -> zero -> posed (reference module.py:408-422)
    pose_aa = jnp.concatenate(
        [
            smplx_param.root_pose[None],
            smplx_param.body_pose,
            smplx_param.jaw_pose[None],
            smplx_param.leye_pose[None],
            smplx_param.reye_pose[None],
            smplx_param.lhand_pose,
            smplx_param.rhand_pose,
        ],
        axis=0,
    )
    _, T_pose = rigid_transform(
        axis_angle_to_matrix(pose_aa), joints_zero, assets.parents
    )
    T_joint = jnp.einsum("jab,jbc->jac", T_pose, T_neutral)  # (J, 4, 4)

    # per-vertex transform via skinning weights of the nearest vertex
    W = buffers.skinning_weight[nn_idx]  # (V_hr, J)
    J = T_joint.shape[0]
    T_vert = jnp.matmul(
        W, T_joint.reshape(J, 16), preferred_element_type=jnp.float32
    ).reshape(V_hr, 4, 4)

    def lbs_pose(x):
        posed = (
            jnp.einsum("vij,vj->vi", T_vert[:, :3, :3], x) + T_vert[:, :3, 3]
        )
        return posed + smplx_param.trans[None, :]

    mean_posed = lbs_pose(mean_3d)
    mean_posed_refined = lbs_pose(mean_3d_refined)

    if not is_world_coord:
        # camera -> world (reference module.py:552-557)
        to_world = lambda x: (x - cam_t[None, :]) @ cam_R
        mean_posed = to_world(mean_posed)
        mean_posed_refined = to_world(mean_posed_refined)

    # view/pose-dependent rgb refinement (reference module.py:495-511)
    normal = vertex_normals(
        jax.lax.stop_gradient(mean_posed_refined), prior.faces_upsampled
    )
    cav = buffers.is_cavity.astype(jnp.float32)[:, None]
    normal = normal * (1.0 - cav) - normal * cav  # cavity normals flip
    rgb_in = jnp.concatenate([tri_feat, pose_tiled, normal], axis=1)
    rgb_offset = apply_mlp(params.rgb_offset_net, rgb_in, relu_final=False, use_gn=True)

    rgb = (jnp.tanh(rgb_raw) + 1.0) / 2.0
    rgb_refined = (jnp.tanh(rgb_raw + rgb_offset) + 1.0) / 2.0

    rotation = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0]), (V_hr, 4)
    )
    opacity = jnp.ones((V_hr, 1))
    live = jnp.ones((V_hr,), bool)

    assets_out = GaussianAssets(
        mean_3d=mean_posed, opacity=opacity, scale=scale,
        rotation=rotation, rgb=rgb, live=live,
    )
    assets_ref = GaussianAssets(
        mean_3d=mean_posed_refined, opacity=opacity, scale=scale_refined,
        rotation=rotation, rgb=rgb_refined, live=live,
    )
    return HumanForwardOut(
        assets=assets_out,
        assets_refined=assets_ref,
        mean_offset=mean_offset,
        mean_offset_offset=mean_offset_offset,
        scale_offset=scale_offset,
        rgb_offset=rgb_offset,
        mesh_neutral_pose=mesh_neutral_hr,
        scale_wo_clamp=scale,
        scale_refined_wo_clamp=scale_refined,
    )


def clamp_warmup_scale(out: HumanForwardOut, max_scale: float = 0.001) -> HumanForwardOut:
    """Warmup scale clamp (reference avatar/main/model.py:90-97): random-init
    nets emit huge scales that would explode tile occupancy."""
    a = out.assets._replace(scale=jnp.minimum(out.assets.scale, max_scale))
    r = out.assets_refined._replace(
        scale=jnp.minimum(out.assets_refined.scale, max_scale)
    )
    return out._replace(assets=a, assets_refined=r)
