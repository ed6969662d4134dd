"""Fitting model: SMPL-X + FLAME forwards, keypoint losses, couplings.

Functional equivalent of the reference fitting Model
(reference fitting/main/model.py:13-279): per frame it evaluates the SMPL-X
mesh (with/without face offset, with/without pose+expr) and the FLAME mesh,
projects 135 whole-body keypoints into the normalized supervision space,
gates face losses by visibility, and assembles ~15 loss terms with the
stage flags (warmup) as traced booleans.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core.rotations import rotation_6d_to_axis_angle
from ..models.smplx.flame import FLAME_PARENTS
from ..models.smplx.model import smplx_forward
from ..models.smplx.flame import FLAMEParams, flame_forward
from ..models.smplx.structs import SMPLXAssets, SMPLXParams
from ..avatar.losses import (
    build_laplacian_neighbors,
    laplacian,
    symmetric_joint_pairs,
)
from . import losses as FL
from .keypoints import (
    KPT_PART_IDX,
    KPT_ROOT_IDX,
    SMPLX_KPT_NAMES,
    extra_joint_ids_for,
    full_keypoints,
)
from .params import (
    FittingParams,
    pad_face_offset,
    weight_joint_offset,
    weight_locator_offset,
)

class FitFrameData(NamedTuple):
    """Per-frame supervision (reference dataset payload)."""

    kpt_img: jnp.ndarray  # (135, 2) detected keypoints, normalized space
    kpt_valid: jnp.ndarray  # (135, 1)
    focal_proj: jnp.ndarray  # (2,) camera of the normalized space
    princpt_proj: jnp.ndarray  # (2,)
    flame_valid: jnp.ndarray  # () bool — DECA init exists for this frame
    # initial estimates (Hand4Whole / DECA), axis-angle
    init_smplx_pose: jnp.ndarray  # (55, 3) full pose in joint order
    init_flame_pose: jnp.ndarray  # (4, 3) neck/jaw/leye/reye
    init_flame_shape: jnp.ndarray  # (S_f,)
    init_flame_expr: jnp.ndarray  # (E,)


@flax.struct.dataclass
class FitStatics:
    """Static tables for the fitting losses."""

    smplx_assets: SMPLXAssets
    flame_assets: SMPLXAssets
    face_vertex_idx: jnp.ndarray  # (V_flame,) into SMPL-X verts
    extra_joint_ids: jnp.ndarray  # (21,)
    flame_lap_idx: jnp.ndarray  # (V_flame, 10)
    flame_lap_w: jnp.ndarray
    flame_is_not_neck: jnp.ndarray  # (V_flame, 1) float
    flip_closest_faces: jnp.ndarray  # (V_smplx, 3)
    flip_bc: jnp.ndarray  # (V_smplx, 3)
    right_joint_idx: jnp.ndarray
    left_joint_idx: jnp.ndarray
    spine_joint_idx: jnp.ndarray  # joints regularized against kyphosis
    hand_joint_idx: jnp.ndarray  # lhand+rhand joint rows
    lear_vertex_idx: int = flax.struct.field(pytree_node=False)
    rear_vertex_idx: int = flax.struct.field(pytree_node=False)


def build_fit_statics(
    smplx_assets: SMPLXAssets,
    flame_assets: SMPLXAssets,
    face_vertex_idx: np.ndarray,
    flip_closest_faces: Optional[np.ndarray] = None,
    flip_bc: Optional[np.ndarray] = None,
    lear_vertex_idx: int = 0,
    rear_vertex_idx: int = 0,
) -> FitStatics:
    V_f = flame_assets.num_vertices
    lap_idx, lap_w = build_laplacian_neighbors(np.asarray(flame_assets.faces), V_f)
    not_neck = np.ones((V_f, 1), np.float32)
    # neck = verts dominated by the FLAME root joint (reference
    # model.py:221-223 uses lbs argmax == root)
    dom = np.asarray(flame_assets.lbs_weights).argmax(1)
    not_neck[dom == 0] = 0.0
    if flip_closest_faces is None:
        flip_closest_faces, flip_bc = FL.synthetic_flip_correspondence(
            np.asarray(smplx_assets.v_template), np.asarray(smplx_assets.faces)
        )
    r_idx, l_idx = symmetric_joint_pairs()
    from ..models.smplx.structs import SMPLX_JOINT_NAMES

    spine_idx = np.asarray(
        [SMPLX_JOINT_NAMES.index(n)
         for n in ("Spine_1", "Spine_2", "Spine_3", "Neck", "Head")],
        np.int32,
    )
    from ..models.smplx.prior import JOINT_PART

    hand_idx = np.asarray(
        list(JOINT_PART["lhand"]) + list(JOINT_PART["rhand"]), np.int32
    )
    return FitStatics(
        smplx_assets=smplx_assets,
        flame_assets=flame_assets,
        face_vertex_idx=jnp.asarray(np.asarray(face_vertex_idx, np.int32)),
        extra_joint_ids=jnp.asarray(extra_joint_ids_for(smplx_assets)),
        flame_lap_idx=jnp.asarray(lap_idx),
        flame_lap_w=jnp.asarray(lap_w),
        flame_is_not_neck=jnp.asarray(not_neck),
        flip_closest_faces=jnp.asarray(np.asarray(flip_closest_faces, np.int32)),
        flip_bc=jnp.asarray(np.asarray(flip_bc, np.float32)),
        right_joint_idx=jnp.asarray(r_idx),
        left_joint_idx=jnp.asarray(l_idx),
        spine_joint_idx=jnp.asarray(spine_idx),
        hand_joint_idx=jnp.asarray(hand_idx),
        lear_vertex_idx=int(lear_vertex_idx),
        rear_vertex_idx=int(rear_vertex_idx),
    )


def _decode_frame(params: FittingParams, i) -> Tuple[SMPLXParams, FLAMEParams]:
    d6 = rotation_6d_to_axis_angle
    E_assets_expr = params.expr.shape[1]
    sp = SMPLXParams(
        betas=params.smplx_shape,
        expr=params.expr[i],
        root_pose=d6(params.smplx_root_pose[i]),
        body_pose=d6(params.smplx_body_pose[i]),
        jaw_pose=d6(params.jaw_pose[i]),
        leye_pose=d6(params.leye_pose[i]),
        reye_pose=d6(params.reye_pose[i]),
        lhand_pose=d6(params.smplx_lhand_pose[i]),
        rhand_pose=d6(params.smplx_rhand_pose[i]),
        trans=jnp.zeros(3),  # translation applied root-relative below
    )
    fp = FLAMEParams(
        betas=params.flame_shape,
        expr=params.expr[i],
        root_pose=d6(params.flame_root_pose[i]),
        neck_pose=d6(params.flame_neck_pose[i]),
        jaw_pose=d6(params.jaw_pose[i]),
        leye_pose=d6(params.leye_pose[i]),
        reye_pose=d6(params.reye_pose[i]),
        trans=jnp.zeros(3),
    )
    return sp, fp


def _project(kpt_cam, focal, princpt):
    x = kpt_cam[:, 0] / kpt_cam[:, 2] * focal[0] + princpt[0]
    y = kpt_cam[:, 1] / kpt_cam[:, 2] * focal[1] + princpt[1]
    return jnp.stack([x, y], axis=1)


def smplx_coords(
    statics: FitStatics,
    sp: SMPLXParams,
    trans: jnp.ndarray,
    params: FittingParams,
    use_pose: bool = True,
    use_expr: bool = True,
    use_face_offset: bool = True,
    use_joint_offset: bool = True,
    use_locator_offset: bool = True,
    detach_face_pose: bool = True,
):
    """SMPL-X mesh/keypoints, root-relative + trans (reference
    get_smplx_coord, model.py:56-122)."""
    a = statics.smplx_assets
    if not use_pose:
        z = jnp.zeros
        sp = sp.replace(
            root_pose=z((3,)), body_pose=z((21, 3)), jaw_pose=z((3,)),
            leye_pose=z((3,)), reye_pose=z((3,)),
            lhand_pose=z((15, 3)), rhand_pose=z((15, 3)),
        )
    if not use_expr:
        sp = sp.replace(expr=jnp.zeros_like(sp.expr))
    if detach_face_pose:
        # jaw/eyes/expr are optimized through the FLAME branch (reference
        # model.py:95: detached in the smplx call)
        sg = jax.lax.stop_gradient
        sp = sp.replace(
            jaw_pose=sg(sp.jaw_pose), leye_pose=sg(sp.leye_pose),
            reye_pose=sg(sp.reye_pose), expr=sg(sp.expr),
        )
    face_offset = (
        pad_face_offset(params.face_offset, statics.face_vertex_idx, a.num_vertices)
        if use_face_offset else None
    )
    joint_offset = (
        weight_joint_offset(params.joint_offset) if use_joint_offset else None
    )
    locator_offset = (
        weight_locator_offset(params.locator_offset) if use_locator_offset else None
    )
    out = smplx_forward(
        a, sp, face_offset=face_offset, joint_offset=joint_offset,
        locator_offset=locator_offset, with_landmarks=True, use_face_contour=True,
    )
    kpt = full_keypoints(out, a, statics.extra_joint_ids)
    root = kpt[KPT_ROOT_IDX]
    mesh = out.vertices - root[None] + trans[None]
    kpt = kpt - root[None] + trans[None]
    return mesh, kpt, root


def flame_coords(statics: FitStatics, fp: FLAMEParams, trans: jnp.ndarray,
                 use_pose: bool = True, use_expr: bool = True):
    """FLAME mesh/keypoints (reference get_flame_coord, model.py:124-160)."""
    a = statics.flame_assets
    if not use_pose:
        z = jnp.zeros((3,))
        fp = fp.replace(root_pose=z, neck_pose=z, jaw_pose=z, leye_pose=z, reye_pose=z)
    if not use_expr:
        fp = fp.replace(expr=jnp.zeros_like(fp.expr))
    out = flame_forward(a, fp, with_landmarks=True)
    lear = out.vertices[statics.lear_vertex_idx][None]
    rear = out.vertices[statics.rear_vertex_idx][None]
    kpt = jnp.concatenate([out.joints, out.landmarks, lear, rear], axis=0)
    root = kpt[0]  # FLAME kpt root = first joint (reference flame kpt root)
    mesh = out.vertices - root[None] + trans[None]
    kpt = kpt - root[None] + trans[None]
    return mesh, kpt


def check_face_visibility(face_mesh, leye, reye):
    """Eye-to-face-center direction vs camera direction in the xz plane
    (reference model.py:162-175): face counts as visible when looking
    broadly at the camera."""
    center = face_mesh.mean(0)
    eye = (leye + reye) / 2.0
    ev = eye - center
    cv = center
    ev2 = jnp.stack([ev[0], ev[2]])
    cv2 = jnp.stack([cv[0], cv[2]])
    ev2 = ev2 / jnp.maximum(jnp.linalg.norm(ev2), 1e-12)
    cv2 = cv2 / jnp.maximum(jnp.linalg.norm(cv2), 1e-12)
    return jnp.sum(ev2 * cv2) < math.cos(math.pi / 4.0 * 3.0)


def fitting_forward(
    params: FittingParams,
    statics: FitStatics,
    frames: FitFrameData,  # leaves lead with batch F
    frame_rows: jnp.ndarray,  # (F,) rows into params
    warmup,  # traced bool
    hand_joint_offset,  # traced bool (lifts the hand joint-offset weight)
) -> Dict[str, jnp.ndarray]:
    """Loss dict over a frame batch (reference Model.forward,
    fitting/main/model.py:181-252). Scalar (already-meaned) terms."""
    F = frame_rows.shape[0]
    face_part = jnp.asarray(KPT_PART_IDX["face"])

    def per_frame(i, frame: FitFrameData):
        sp, fp = _decode_frame(params, i)
        s_trans = params.smplx_trans[i]
        f_trans = params.flame_trans[i]

        mesh, kpt_cam, _ = smplx_coords(statics, sp, s_trans, params)
        mesh_wo_fo, kpt_cam_wo_fo, _ = smplx_coords(
            statics, sp, s_trans, params, use_face_offset=False
        )
        f_mesh, f_kpt_cam = flame_coords(statics, fp, f_trans)

        kpt_proj = _project(kpt_cam, frame.focal_proj, frame.princpt_proj)
        kpt_proj_wo_fo = _project(kpt_cam_wo_fo, frame.focal_proj, frame.princpt_proj)
        f_kpt_proj = _project(f_kpt_cam, frame.focal_proj, frame.princpt_proj)

        # zero-pose meshes for the FLAME<->SMPLX shape couplings
        mesh_zero, _, _ = smplx_coords(
            statics, sp, jnp.zeros(3), params, use_pose=False, use_expr=False,
            use_locator_offset=False,
        )
        f_mesh_zero, _ = flame_coords(
            statics, fp, jnp.zeros(3), use_pose=False, use_expr=False
        )

        # initial-parameter coordinates (detached; reference model.py:185-196)
        sg = jax.lax.stop_gradient
        sp_init = sp.replace(
            root_pose=frame.init_smplx_pose[0],
            body_pose=frame.init_smplx_pose[1:22],
            jaw_pose=frame.init_smplx_pose[22],
            leye_pose=frame.init_smplx_pose[23],
            reye_pose=frame.init_smplx_pose[24],
            lhand_pose=frame.init_smplx_pose[25:40],
            rhand_pose=frame.init_smplx_pose[40:55],
            betas=sg(sp.betas), expr=sg(sp.expr),
        )
        mesh_init, kpt_cam_init, _ = jax.tree.map(
            sg,
            smplx_coords(statics, sp_init, sg(s_trans), params,
                         use_face_offset=False),
        )
        face_valid = check_face_visibility(
            mesh_init[statics.face_vertex_idx],
            kpt_cam_init[SMPLX_KPT_NAMES.index("L_Eye")],
            kpt_cam_init[SMPLX_KPT_NAMES.index("R_Eye")],
        )
        face_valid = face_valid & frame.flame_valid

        # keypoint weights (reference model.py:199-203): after warmup, face
        # keypoints count only when the face is visible
        w = jnp.ones((kpt_proj.shape[0], 1))
        face_name_rows = jnp.asarray(
            [k for k, n in enumerate(SMPLX_KPT_NAMES) if "Face" in n]
        )
        face_w = jnp.where(warmup | face_valid, 1.0, 0.0)
        w = w.at[face_name_rows].set(face_w)

        losses = {}
        losses["smplx_kpt_proj"] = jnp.mean(
            FL.coord_loss(kpt_proj, frame.kpt_img, frame.kpt_valid, kpt_cam) * w
        )
        losses["smplx_kpt_proj_wo_fo"] = jnp.mean(
            FL.coord_loss(kpt_proj_wo_fo, frame.kpt_img, frame.kpt_valid, kpt_cam) * w
        )
        losses["flame_kpt_proj"] = jnp.mean(
            jnp.abs(f_kpt_proj - frame.kpt_img[face_part])
            * frame.kpt_valid[face_part] * w[face_part]
        )

        # warmup: pull FLAME onto the SMPLX face; after: priors + couplings
        v2v = jnp.mean(jnp.abs(f_mesh - sg(mesh[statics.face_vertex_idx])))
        losses["flame_to_smplx_v2v"] = jnp.where(warmup, v2v, 0.0)

        post = {}
        post["smplx_shape_reg"] = jnp.mean(params.smplx_shape ** 2) * 0.01
        post["smplx_mesh"] = jnp.mean(jnp.abs(
            (mesh_wo_fo - kpt_cam_wo_fo[KPT_ROOT_IDX][None])
            - (mesh_init - kpt_cam_init[KPT_ROOT_IDX][None])
        )) * 0.1
        pose_now = sp.root_pose[None]
        full_now = jnp.concatenate(
            [sp.root_pose[None], sp.body_pose, sp.jaw_pose[None],
             sp.leye_pose[None], sp.reye_pose[None], sp.lhand_pose,
             sp.rhand_pose], axis=0,
        )
        post["smplx_pose"] = jnp.mean(
            FL.pose_loss(full_now, frame.init_smplx_pose)
        ) * 0.1
        post["smplx_pose_reg"] = jnp.mean(
            full_now[statics.spine_joint_idx, 0] ** 2
        )
        flame_pose_now = jnp.stack(
            [fp.neck_pose, fp.jaw_pose, fp.leye_pose, fp.reye_pose], axis=0
        )
        post["flame_pose"] = jnp.mean(
            FL.pose_loss(flame_pose_now, frame.init_flame_pose)
        ) * 0.1
        post["flame_shape"] = jnp.mean(
            jnp.abs(params.flame_shape - frame.init_flame_shape)
        ) * 0.1
        post["flame_expr"] = jnp.mean(
            jnp.abs(params.expr[i] - frame.init_flame_expr)
        ) * 0.1

        nn = statics.flame_is_not_neck
        sm_face = mesh_zero[statics.face_vertex_idx]
        post["smplx_to_flame_v2v_wo_pose_expr"] = jnp.mean(jnp.abs(
            (sm_face - sm_face.mean(0)[None])
            - sg(f_mesh_zero - f_mesh_zero.mean(0)[None])
        ) * nn) * 10.0
        lap_o = laplacian(sm_face, statics.flame_lap_idx, statics.flame_lap_w)
        lap_t = laplacian(sg(f_mesh_zero), statics.flame_lap_idx, statics.flame_lap_w)
        post["smplx_to_flame_lap"] = jnp.mean(((lap_o - lap_t) ** 2) * nn) * 100000.0
        post["smplx_to_flame_edge_length"] = jnp.mean(
            FL.edge_length_loss(sm_face, sg(f_mesh_zero), nn,
                                statics.flame_assets.faces)
        )

        is_neck = 1.0 - nn
        fo_full = pad_face_offset(
            params.face_offset, statics.face_vertex_idx,
            statics.smplx_assets.num_vertices,
        )
        post["face_offset_reg"] = jnp.mean(
            (fo_full[statics.face_vertex_idx] ** 2) * is_neck
        ) * 1000.0
        jw = jnp.ones((statics.smplx_assets.num_joints, 1))
        hand_w = jnp.where(hand_joint_offset, 1.0, 10.0)
        jw = jw.at[statics.hand_joint_idx].set(hand_w)
        post["joint_offset_reg"] = jnp.mean(params.joint_offset ** 2 * jw) * 100.0
        post["locator_offset_reg"] = jnp.mean(params.locator_offset ** 2)
        post["face_offset_sym_reg"] = jnp.mean(FL.face_offset_symmetric_reg(
            params.face_offset, statics.face_vertex_idx,
            statics.smplx_assets.num_vertices,
            statics.flip_closest_faces, statics.flip_bc,
        ))
        from ..avatar.losses import joint_offset_symmetric_reg

        post["joint_offset_sym_reg"] = joint_offset_symmetric_reg(
            params.joint_offset, statics.right_joint_idx, statics.left_joint_idx
        )
        post["locator_offset_sym_reg"] = joint_offset_symmetric_reg(
            params.locator_offset, statics.right_joint_idx, statics.left_joint_idx
        )
        for k, v in post.items():
            losses[k] = jnp.where(warmup, 0.0, v)
        return losses

    per = jax.vmap(per_frame, in_axes=(0, 0))(frame_rows, frames)
    return {k: jnp.mean(v) for k, v in per.items()}
