"""Shared app plumbing: build a full avatar setup from a subject directory.

Bridges the data layer to the model/train stacks (the role of the
reference's Trainer._make_batch_generator/_make_model,
avatar/common/base.py:110-145).
"""
from __future__ import annotations

import os.path as osp
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..avatar import scene as sc
from ..avatar.config import AvatarConfig
from ..avatar.human import init_human
from ..avatar.model import AvatarTrainables, FrameData, build_statics
from ..avatar.param_dict import init_param_frames
from ..core.camera import Camera
from ..data.subject import SubjectData, load_frame_arrays, load_subject
from ..models.smplx import (
    SMPLXIDInfo,
    build_prior,
    load_prior_tables,
    load_smplx_assets,
    synthetic_smplx_assets,
)
from ..models.smplx.flame import load_flame_uv
from ..models.smplx.prior import REAL_LIP_VERTEX_IDX
from ..ops.lpips import init_lpips_random, load_lpips
from ..train.loop import ModelBundle


def resolve_lpips(
    lpips_weights: Optional[str], net: str = "vgg", quiet: bool = False
):
    """Load pretrained LPIPS weights, or fall back LOUDLY to random init.

    The reference's perceptual loss is pretrained-VGG LPIPS
    (avatar/common/nets/loss.py:80-97); results are not
    reference-comparable with random features, so the fallback is a
    WARNING, and a *given-but-missing* path is an error rather than a
    silent downgrade.
    """
    if lpips_weights is not None:
        if not osp.exists(lpips_weights):
            raise FileNotFoundError(
                f"--lpips_weights {lpips_weights!r} does not exist; refusing "
                "to silently fall back to random LPIPS features"
            )
        return load_lpips(lpips_weights)
    import logging

    if quiet:  # test/animate paths never evaluate the LPIPS loss
        return init_lpips_random(jax.random.PRNGKey(1), net)
    logging.getLogger("exavatar").warning(
        "LPIPS running with RANDOM %s weights (no --lpips_weights given). "
        "Loss values and eval metrics are NOT comparable to the reference; "
        "convert pretrained weights once with "
        "exavatar_release_tpu.ops.lpips.convert_torch_lpips on a machine "
        "with the `lpips` pip package.",
        net,
    )
    return init_lpips_random(jax.random.PRNGKey(1), net)


def face_mesh_for(human_model_path: Optional[str], prior):
    """FLAME face mesh (faces, vertex UV, face UV) for the face render.

    Real FLAME topology + UV atlas when ``human_model_path`` is given
    (reference avatar/common/utils/flame.py:29-50), the synthetic
    placeholder otherwise. All five CLIs (train/test/unwrap/evaluate/
    animate) route through here so none can silently render real assets
    with a fake UV atlas.
    """
    if human_model_path is not None:
        from ..models.smplx.flame import load_flame_assets

        flame_assets = load_flame_assets(human_model_path)
        vertex_uv, face_uv = load_flame_uv(human_model_path)
        return np.asarray(flame_assets.faces), vertex_uv, face_uv
    return synthetic_face_mesh(prior)


def build_fit_statics_for(human_model_path: Optional[str]):
    """Fitting statics from real assets when a path is given, synthetic
    otherwise (shared by apps/fit.py and the smooth check-video step)."""
    from ..fitting.model import build_fit_statics

    if human_model_path:
        from ..models.smplx.flame import load_flame_assets

        smplx_assets = load_smplx_assets(human_model_path, "male")
        flame_assets = load_flame_assets(human_model_path)
        tables = load_prior_tables(human_model_path)
        flip = np.load(
            osp.join(human_model_path, "smplx",
                     "smplx_flip_correspondences.npz")
        )
        return build_fit_statics(
            smplx_assets, flame_assets, tables["face_vertex_idx"],
            flip["closest_faces"], flip["bc"],
        )
    from ..models.smplx.flame import synthetic_flame_assets

    smplx_assets = synthetic_smplx_assets()
    # the expression space is SHARED between the two models — keep dims equal
    flame_assets, _ = synthetic_flame_assets(num_expr=smplx_assets.num_expr)
    prior = build_prior(smplx_assets)
    fv = np.asarray(prior.face_vertex_idx)
    Vf = flame_assets.num_vertices
    fv = np.concatenate([fv, np.tile(fv[-1:], max(0, Vf - fv.size))])[:Vf]
    return build_fit_statics(smplx_assets, flame_assets, fv)


def build_prior_for(human_model_path: Optional[str], gender: str = "male"):
    """Real assets when a human_model_path is given, synthetic otherwise."""
    if human_model_path is not None and osp.exists(human_model_path):
        assets = load_smplx_assets(human_model_path, gender)
        tables = load_prior_tables(human_model_path)
        return build_prior(
            assets,
            lip_vertex_idx=REAL_LIP_VERTEX_IDX,
            face_vertex_idx=tables["face_vertex_idx"],
            lhand_vertex_idx=tables["lhand_vertex_idx"],
            rhand_vertex_idx=tables["rhand_vertex_idx"],
            expr_vertex_idx=tables.get("expr_vertex_idx"),
        )
    return build_prior(synthetic_smplx_assets())


def subject_bundle(
    subject: SubjectData,
    prior,
    cfg: AvatarConfig,
    flame_faces: np.ndarray,
    flame_vertex_uv: np.ndarray,
    flame_face_uv: np.ndarray,
    lpips_weights: Optional[str] = None,
    seed: int = 0,
    lpips_quiet: bool = False,
):
    """(trainables, scene_state, bundle, frame_rows) from a loaded subject."""
    import cv2

    a = prior.assets

    def fit_shape(x, shape):
        """Coerce an identity table to the prior's dimensions (real subjects
        always match; synthetic/partial subjects get zero-padded)."""
        out = np.zeros(shape, np.float32)
        if x is not None:
            x = np.asarray(x, np.float32)
            if x.shape == shape:
                out = x
            else:
                sl = tuple(slice(0, min(d, s)) for d, s in zip(x.shape, shape))
                if len(x.shape) == len(shape):
                    out[sl] = x[sl]
        return out

    id_info = SMPLXIDInfo(
        shape_param=jnp.asarray(fit_shape(subject.shape_param, (a.num_shape,))),
        face_offset=jnp.asarray(
            fit_shape(subject.face_offset, (a.num_vertices, 3))
        ),
        joint_offset=jnp.asarray(
            fit_shape(subject.joint_offset, (a.num_joints, 3))
        ),
        locator_offset=jnp.asarray(
            fit_shape(subject.locator_offset, (a.num_joints, 3))
        ),
    )
    human_params, buffers = init_human(jax.random.PRNGKey(seed), prior, id_info, cfg)
    statics = build_statics(prior, buffers, flame_faces, flame_vertex_uv, flame_face_uv)

    pts = subject.scene_points
    scene_state = sc.init_from_point_cloud(
        jnp.asarray(pts[:, :3]), jnp.asarray(pts[:, 3:6]),
        jnp.asarray(subject.cam_dist_translate),
        jnp.asarray(subject.cam_dist_radius),
        cfg.scene_capacity,
    )

    unique_frames = sorted(set(subject.frame_ids))
    frame_row_of = {f: i for i, f in enumerate(unique_frames)}
    params_list = [subject.smplx_params[f] for f in unique_frames]
    trainables = AvatarTrainables(
        scene=scene_state.params,
        human=human_params,
        frames=init_param_frames(params_list),
    )

    if subject.face_texture_path is not None:
        tex = cv2.imread(subject.face_texture_path)[:, :, ::-1]
        tex = jnp.asarray(tex.astype(np.float32).transpose(2, 0, 1) / 255.0)
        texm = cv2.imread(subject.face_texture_mask_path)[:, :, 0:1]
        texm = jnp.asarray(texm.astype(np.float32).transpose(2, 0, 1) / 255.0)
    else:
        tex = jnp.full((3, 16, 16), 0.5)
        texm = jnp.ones((1, 16, 16))

    lpips = resolve_lpips(lpips_weights, "vgg", quiet=lpips_quiet)
    bundle = ModelBundle(
        buffers=buffers, prior=prior, statics=statics, id_info=id_info,
        lpips=lpips, face_texture=tex, face_texture_mask=texm,
        init_joint_offset=id_info.joint_offset,
    )
    return trainables, scene_state, bundle, frame_row_of


def frame_to_device(arrs) -> FrameData:
    cp = arrs["cam_param"]
    return FrameData(
        img=jnp.asarray(arrs["img"]),
        mask=jnp.asarray(arrs["mask"]),
        bbox=jnp.asarray(arrs["bbox"]),
        cam=Camera(
            R=jnp.asarray(cp["R"]), t=jnp.asarray(cp["t"]),
            focal=jnp.asarray(cp["focal"]), princpt=jnp.asarray(cp["princpt"]),
        ),
        frame_row=jnp.asarray(arrs["frame_row"]),
    )


def synthetic_face_mesh(prior):
    """FLAME-equivalent face mesh for synthetic assets (SMPL-X faces fully
    inside the face region, re-indexed over face_vertex_idx order)."""
    fv = np.asarray(prior.face_vertex_idx)
    faces = np.asarray(prior.assets.faces)
    inv = -np.ones(prior.assets.num_vertices, np.int64)
    inv[fv] = np.arange(fv.size)
    inside = (inv[faces] >= 0).all(axis=1)
    face_faces = inv[faces[inside]].astype(np.int32)
    if face_faces.size == 0:
        face_faces = np.zeros((1, 3), np.int32)
    pts = np.asarray(prior.assets.v_template)[fv]
    lo, hi = pts.min(0), pts.max(0)
    uv = ((pts[:, :2] - lo[:2]) / np.maximum(hi[:2] - lo[:2], 1e-6)).astype(np.float32)
    return face_faces, uv, face_faces
