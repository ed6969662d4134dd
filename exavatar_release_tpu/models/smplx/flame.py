"""FLAME head model in pure JAX.

Equivalent capability to the reference's pip-smplx FLAME layers
(reference avatar/common/utils/flame.py:29-50 and
fitting/common/utils/flame.py:9-75): 5-joint head skeleton
(global/neck/jaw/leye/reye), 100 shape + 50 expression dims, static +
dynamic-contour landmarks, UV texture tables. Reuses the generic LBS core
(lbs.py) with the FLAME kinematic tree.
"""
from __future__ import annotations

import os.path as osp
import pickle
from typing import Optional, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

from .assets_io import SHAPE_SPACE_DIM, _uv_sphere
from .lbs import lbs as _lbs_fn, neck_yaw_bucket, vertices_to_landmarks
from ...core.rotations import axis_angle_to_matrix
from .structs import SMPLXAssets, SMPLXOutput

FLAME_JOINT_NAMES: Tuple[str, ...] = ("Global", "Neck", "Jaw", "L_Eye", "R_Eye")
FLAME_PARENTS: Tuple[int, ...] = (-1, 0, 1, 1, 1)
FLAME_NECK_KIN_CHAIN: Tuple[int, ...] = (1,)  # neck rotation only


@flax.struct.dataclass
class FLAMEParams:
    """One frame of FLAME parameters, axis-angle (batch via vmap)."""

    betas: jnp.ndarray  # (S,)
    expr: jnp.ndarray  # (E,)
    root_pose: jnp.ndarray  # (3,) global orient
    neck_pose: jnp.ndarray  # (3,)
    jaw_pose: jnp.ndarray  # (3,)
    leye_pose: jnp.ndarray  # (3,)
    reye_pose: jnp.ndarray  # (3,)
    trans: jnp.ndarray  # (3,)

    @staticmethod
    def zeros(num_shape: int = 100, num_expr: int = 50, dtype=jnp.float32) -> "FLAMEParams":
        z3 = jnp.zeros((3,), dtype)
        return FLAMEParams(
            betas=jnp.zeros((num_shape,), dtype),
            expr=jnp.zeros((num_expr,), dtype),
            root_pose=z3, neck_pose=z3, jaw_pose=z3,
            leye_pose=z3, reye_pose=z3, trans=z3,
        )

    def full_pose(self) -> jnp.ndarray:
        return jnp.stack(
            [self.root_pose, self.neck_pose, self.jaw_pose,
             self.leye_pose, self.reye_pose],
            axis=0,
        )


def flame_forward(
    assets: SMPLXAssets,
    params: FLAMEParams,
    face_offset: Optional[jnp.ndarray] = None,
    with_landmarks: bool = True,
    use_face_contour: bool = True,
) -> SMPLXOutput:
    """FLAME forward (semantics of pip smplx FLAME.forward, consumed at
    reference fitting/main/model.py via the flame singleton)."""
    full_pose = params.full_pose()
    shape_coeffs = jnp.concatenate([params.betas, params.expr], axis=0)
    shapedirs = jnp.concatenate([assets.shapedirs, assets.expr_dirs], axis=-1)
    v_template = assets.v_template
    if face_offset is not None:
        v_template = v_template + face_offset

    rot_mats = axis_angle_to_matrix(full_pose)
    verts, joints, A = _lbs_fn(
        shape_coeffs,
        rot_mats,
        v_template,
        shapedirs,
        assets.posedirs,
        assets.joint_regressor,
        assets.parents,
        assets.lbs_weights,
        pose2rot=False,
    )

    landmarks = None
    if with_landmarks:
        lmk_faces_idx = assets.lmk_faces_idx
        lmk_bary = assets.lmk_bary_coords
        if use_face_contour and assets.dyn_lmk_faces_idx.size > 0:
            bucket = neck_yaw_bucket(rot_mats, assets.neck_kin_chain)
            lmk_faces_idx = jnp.concatenate(
                [lmk_faces_idx, assets.dyn_lmk_faces_idx[bucket]], axis=0
            )
            lmk_bary = jnp.concatenate(
                [lmk_bary, assets.dyn_lmk_bary_coords[bucket]], axis=0
            )
        landmarks = vertices_to_landmarks(verts, assets.faces, lmk_faces_idx, lmk_bary)
        landmarks = landmarks + params.trans[None, :]

    from .lbs import blend_shapes, vertices_to_joints

    v_shaped = assets.v_template + blend_shapes(params.betas, assets.shapedirs)
    joints_zero = vertices_to_joints(
        assets.joint_regressor,
        v_template + blend_shapes(shape_coeffs, shapedirs),
    )
    return SMPLXOutput(
        vertices=verts + params.trans[None, :],
        joints=joints + params.trans[None, :],
        landmarks=landmarks,
        v_shaped=v_shaped,
        joints_zero_pose=joints_zero,
        rel_transforms=A,
    )


@flax.struct.dataclass
class FLAMEPrior:
    """UV/texture tables around FLAME assets (reference
    avatar/common/utils/flame.py:29-47: vertex_uv/face_uv with flipped v,
    plus a per-subject texture set later by the dataset)."""

    assets: SMPLXAssets
    vertex_uv: jnp.ndarray  # (Vt, 2) in [0, 1], v already flipped
    face_uv: jnp.ndarray  # (F, 3) int32 indices into vertex_uv

    @property
    def vertex_num(self) -> int:
        return self.assets.num_vertices


def load_flame_assets(
    human_model_path: str,
    num_shape: int = 100,
    num_expr: int = 50,
) -> SMPLXAssets:
    """Load released FLAME assets (generic_model.pkl / FLAME npz +
    landmark embedding), matching what pip smplx builds for the reference."""
    base = osp.join(human_model_path, "flame")
    model = None
    for name in ("FLAME_NEUTRAL.npz", "generic_model.npz"):
        p = osp.join(base, name)
        if osp.exists(p):
            model = dict(np.load(p, allow_pickle=True))
            break
    if model is None:
        with open(osp.join(base, "generic_model.pkl"), "rb") as f:
            model = pickle.load(f, encoding="latin1")

    def arr(x):
        return np.asarray(x, np.float32)

    shapedirs_all = arr(model["shapedirs"])
    shapedirs = shapedirs_all[:, :, :num_shape]
    expr_dirs = shapedirs_all[:, :, SHAPE_SPACE_DIM : SHAPE_SPACE_DIM + num_expr]
    posedirs = arr(model["posedirs"])
    V = posedirs.shape[0]
    posedirs = posedirs.reshape(V * 3, -1).T

    lmk = {}
    lmk_path = osp.join(base, "flame_static_embedding.pkl")
    dyn_path = osp.join(base, "flame_dynamic_embedding.npy")
    if osp.exists(lmk_path):
        with open(lmk_path, "rb") as f:
            static = pickle.load(f, encoding="latin1")
        lmk["faces"] = np.asarray(static["lmk_face_idx"], np.int32)
        lmk["bary"] = np.asarray(static["lmk_b_coords"], np.float32)
    else:
        lmk["faces"] = np.zeros((0,), np.int32)
        lmk["bary"] = np.zeros((0, 3), np.float32)
    if osp.exists(dyn_path):
        dyn = np.load(dyn_path, allow_pickle=True, encoding="latin1")[()]
        lmk["dyn_faces"] = np.asarray(dyn["lmk_face_idx"], np.int32)
        lmk["dyn_bary"] = np.asarray(dyn["lmk_b_coords"], np.float32)
    else:
        lmk["dyn_faces"] = np.zeros((79, 0), np.int32)
        lmk["dyn_bary"] = np.zeros((79, 0, 3), np.float32)

    J = 5
    return SMPLXAssets(
        v_template=jnp.asarray(arr(model["v_template"])),
        shapedirs=jnp.asarray(shapedirs),
        expr_dirs=jnp.asarray(expr_dirs),
        posedirs=jnp.asarray(posedirs),
        joint_regressor=jnp.asarray(arr(model["J_regressor"])),
        lbs_weights=jnp.asarray(arr(model["weights"])),
        pose_mean=jnp.zeros((J * 3,), jnp.float32),
        faces=jnp.asarray(np.asarray(model["f"], np.int32)),
        lmk_faces_idx=jnp.asarray(lmk["faces"]),
        lmk_bary_coords=jnp.asarray(lmk["bary"]),
        dyn_lmk_faces_idx=jnp.asarray(lmk["dyn_faces"]),
        dyn_lmk_bary_coords=jnp.asarray(lmk["dyn_bary"]),
        parents=FLAME_PARENTS,
        neck_kin_chain=FLAME_NECK_KIN_CHAIN,
    )


def load_flame_uv(human_model_path: str) -> Tuple[np.ndarray, np.ndarray]:
    """FLAME_texture.npz UV tables with the v-flip the reference applies
    (reference avatar/common/utils/flame.py:39-43)."""
    tex = np.load(osp.join(human_model_path, "flame", "FLAME_texture.npz"))
    vertex_uv = np.asarray(tex["vt"], np.float32).copy()
    face_uv = np.asarray(tex["ft"], np.int64).astype(np.int32)
    vertex_uv[:, 1] = 1.0 - vertex_uv[:, 1]
    return vertex_uv, face_uv


def synthetic_flame_assets(
    rings: int = 12,
    segs: int = 16,
    num_shape: int = 10,
    num_expr: int = 6,
    num_static_lmk: int = 51,
    num_contour_lmk: int = 17,
    seed: int = 1,
) -> Tuple[SMPLXAssets, FLAMEPrior]:
    """Deterministic synthetic FLAME-structured head for tests: sphere mesh,
    5-joint tree, spherical UV parameterization."""
    rng = np.random.default_rng(seed)
    sphere_v, faces = _uv_sphere(rings, segs)
    v_template = (sphere_v * np.array([0.09, 0.11, 0.10]) +
                  np.array([0.0, 0.0, 0.02])).astype(np.float32)
    V = v_template.shape[0]

    joints = np.array(
        [
            [0.0, -0.02, 0.0],  # global
            [0.0, -0.08, -0.01],  # neck
            [0.0, -0.04, 0.04],  # jaw
            [0.03, 0.03, 0.08],  # L eye
            [-0.03, 0.03, 0.08],  # R eye
        ],
        np.float32,
    )
    J = 5
    d2 = ((v_template[:, None, :] - joints[None, :, :]) ** 2).sum(-1)
    logits = -d2 / 0.004
    ex = np.exp(logits - logits.max(1, keepdims=True))
    w = (ex / ex.sum(1, keepdims=True)).astype(np.float32)

    jr = np.zeros((J, V), np.float32)
    near = np.argsort(d2.T, axis=1)[:, :6]
    jrows = np.arange(J)[:, None]
    inv = 1.0 / (np.sqrt(d2.T[jrows, near]) + 1e-3)
    jr[jrows, near] = inv / inv.sum(1, keepdims=True)

    scale = 0.004
    shapedirs = rng.normal(0, scale, (V, 3, num_shape)).astype(np.float32)
    expr_dirs = rng.normal(0, scale, (V, 3, num_expr)).astype(np.float32)
    posedirs = rng.normal(0, scale * 0.1, (9 * (J - 1), V * 3)).astype(np.float32)

    F = faces.shape[0]
    lmk_faces = rng.integers(0, F, num_static_lmk).astype(np.int32)
    lmk_bary = rng.dirichlet(np.ones(3), num_static_lmk).astype(np.float32)
    dyn_faces = rng.integers(0, F, (79, num_contour_lmk)).astype(np.int32)
    dyn_bary = rng.dirichlet(np.ones(3), (79, num_contour_lmk)).astype(np.float32)

    assets = SMPLXAssets(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        expr_dirs=jnp.asarray(expr_dirs),
        posedirs=jnp.asarray(posedirs),
        joint_regressor=jnp.asarray(jr),
        lbs_weights=jnp.asarray(w),
        pose_mean=jnp.zeros((J * 3,), jnp.float32),
        faces=jnp.asarray(faces),
        lmk_faces_idx=jnp.asarray(lmk_faces),
        lmk_bary_coords=jnp.asarray(lmk_bary),
        dyn_lmk_faces_idx=jnp.asarray(dyn_faces),
        dyn_lmk_bary_coords=jnp.asarray(dyn_bary),
        parents=FLAME_PARENTS,
        neck_kin_chain=FLAME_NECK_KIN_CHAIN,
    )

    # spherical UV: u = azimuth, v = polar angle (v-flip already applied)
    x, y, z = sphere_v[:, 0], sphere_v[:, 1], sphere_v[:, 2]
    u = (np.arctan2(z, x) / (2 * np.pi) + 0.5).astype(np.float32)
    vv = (np.arccos(np.clip(y, -1, 1)) / np.pi).astype(np.float32)
    vertex_uv = np.stack([u, vv], 1)
    prior = FLAMEPrior(
        assets=assets,
        vertex_uv=jnp.asarray(vertex_uv),
        face_uv=jnp.asarray(faces),  # per-vertex UV: same topology
    )
    return assets, prior
