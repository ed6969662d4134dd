"""SMPL-X prior: part masks, cavity, 大-pose constants, 2x subdivision.

Functional equivalent of the reference's mutable ``smpl_x`` singleton
(reference avatar/common/utils/smpl_x.py:15-151). Everything is precomputed
once into an immutable pytree; the per-subject identity info (shape /
face_offset / joint_offset / locator_offset), which the reference injects via
``set_id_info`` (smpl_x.py:61-65), is a separate ``SMPLXIDInfo`` value passed
explicitly through the model.
"""
from __future__ import annotations

import math
import os.path as osp
import pickle
from typing import List, Optional, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

from ...core.geometry import vertex_normals
from .structs import SMPLX_JOINT_NAMES, SMPLXAssets
from .subdivide import SubdivisionOp, build_subdivision, upsample_features

# lip vertices of the real SMPL-X topology used to close the mouth cavity
# (data constant; reference smpl_x.py:103)
REAL_LIP_VERTEX_IDX = (2844, 2855, 8977, 1740, 1730, 1789, 8953, 2892)
# triangles over the 8 lip vertices (reference smpl_x.py:107)
CAVITY_FACE_PATTERN = ((0, 1, 7), (1, 2, 7), (2, 3, 5), (3, 4, 5), (2, 5, 6), (2, 6, 7))

JOINT_PART = {
    "body": tuple(range(0, 22)),
    "face": tuple(range(22, 25)),
    "lhand": tuple(range(25, 40)),
    "rhand": tuple(range(40, 55)),
}
ROOT_JOINT_IDX = 0
ARM_JOINT_NAMES = ("R_Shoulder", "R_Elbow", "L_Shoulder", "L_Elbow")


@flax.struct.dataclass
class SMPLXIDInfo:
    """Per-subject identity parameters (reference smpl_x.set_id_info)."""

    shape_param: jnp.ndarray  # (S,)
    face_offset: jnp.ndarray  # (V, 3)
    joint_offset: jnp.ndarray  # (J, 3)
    locator_offset: jnp.ndarray  # (J, 3)

    @staticmethod
    def zeros(num_shape: int, num_verts: int, num_joints: int) -> "SMPLXIDInfo":
        return SMPLXIDInfo(
            shape_param=jnp.zeros((num_shape,)),
            face_offset=jnp.zeros((num_verts, 3)),
            joint_offset=jnp.zeros((num_joints, 3)),
            locator_offset=jnp.zeros((num_joints, 3)),
        )


@flax.struct.dataclass
class SMPLXPrior:
    """Immutable precomputed prior around an ``SMPLXAssets``."""

    assets: SMPLXAssets
    faces_with_cavity: jnp.ndarray  # (F+6, 3) int32
    is_cavity: jnp.ndarray  # (V,) float {0,1} on low-res verts
    # vertex index tables (low-res)
    face_vertex_idx: jnp.ndarray  # (Nf,) SMPL-X verts in FLAME correspondence
    lhand_vertex_idx: jnp.ndarray
    rhand_vertex_idx: jnp.ndarray
    expr_vertex_idx: jnp.ndarray  # face verts driven by expression
    # 大-pose constants (reference smpl_x.py:46-49)
    neutral_body_pose: jnp.ndarray  # (21, 3) axis-angle
    neutral_jaw_pose: jnp.ndarray  # (3,)
    # 2x subdivision over cavity-augmented topology
    subdividers: Tuple[SubdivisionOp, ...]
    faces_upsampled: jnp.ndarray  # (F_hr, 3) int32
    # upsampled per-vertex masks (bool, V_hr)
    is_rhand_hr: jnp.ndarray
    is_lhand_hr: jnp.ndarray
    is_face_hr: jnp.ndarray
    is_face_expr_hr: jnp.ndarray
    is_cavity_hr: jnp.ndarray
    vertex_num_upsampled: int = flax.struct.field(pytree_node=False)

    @property
    def vertex_num(self) -> int:
        return self.assets.num_vertices

    @property
    def joint_num(self) -> int:
        return self.assets.num_joints

    def upsample_mesh(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Carry per-vertex features through both subdivision levels
        (reference smpl_x.upsample_mesh, smpl_x.py:84-100)."""
        return upsample_features(list(self.subdividers), feats)

    def apply_joint_offset_weight(self, joint_offset: jnp.ndarray) -> jnp.ndarray:
        """Zero the root row (reference smpl_x.get_joint_offset, :67-71)."""
        return joint_offset.at[ROOT_JOINT_IDX].set(0.0)

    def get_arm(
        self, mesh_neutral_pose_hr: jnp.ndarray, skinning_weight_hr: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Upper/lower-arm vertex masks from neutral-pose normals
        (reference smpl_x.get_arm, :139-148): arm = verts whose dominant
        skinning joint is a shoulder/elbow; split by normal_y vs cos(60°)."""
        normal = vertex_normals(mesh_neutral_pose_hr, self.faces_upsampled)
        part = jnp.argmax(skinning_weight_hr, axis=1)
        is_arm = jnp.zeros(part.shape, bool)
        for name in ARM_JOINT_NAMES:
            is_arm = is_arm | (part == SMPLX_JOINT_NAMES.index(name))
        thr = math.cos(math.pi / 3.0)
        is_upper = is_arm & (normal[:, 1] > thr)
        is_lower = is_arm & (normal[:, 1] <= thr)
        return is_upper, is_lower


def _derive_part_tables(assets: SMPLXAssets) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hand/face vertex tables from skinning argmax — used for synthetic
    assets when the released correspondence files aren't supplied."""
    w = np.asarray(assets.lbs_weights)
    nearest = w.argmax(1)
    lhand = np.where(np.isin(nearest, JOINT_PART["lhand"]))[0]
    rhand = np.where(np.isin(nearest, JOINT_PART["rhand"]))[0]
    head_set = [SMPLX_JOINT_NAMES.index(n) for n in ("Head", "Jaw", "L_Eye", "R_Eye")]
    face = np.where(np.isin(nearest, head_set))[0]
    return lhand.astype(np.int32), rhand.astype(np.int32), face.astype(np.int32)


def derive_expr_vertex_idx_flame2019(
    flame2019_path: str,
    face_vertex_idx: np.ndarray,
    expr_param_dim: int = 50,
) -> np.ndarray:
    """Real-asset expression-vertex table (reference smpl_x.get_expr_vertex_idx,
    avatar/common/utils/smpl_x.py:115-137): vertices with nonzero FLAME-2019
    expression blendshape support (shapedirs columns 300:300+expr_param_dim;
    FLAME.SHAPE_SPACE_DIM == 300), minus neck/eyeball-dominated vertices,
    mapped to SMPL-X vertex ids through the SMPL-X<->FLAME correspondence."""
    with open(flame2019_path, "rb") as f:
        fl = pickle.load(f, encoding="latin1")
    sd = np.asarray(fl["shapedirs"])
    support = np.where(
        (sd[:, :, 300:300 + expr_param_dim] != 0).sum((1, 2)) > 0
    )[0]
    weights = np.asarray(fl["weights"])
    flame_joints = ("Neck", "Head", "Jaw", "L_Eye", "R_Eye")
    dom = weights.argmax(1)
    bad = np.isin(dom, [flame_joints.index(n) for n in ("Neck", "L_Eye", "R_Eye")])
    keep = np.asarray([i for i in support if not bad[i]])
    return np.asarray(face_vertex_idx)[keep].astype(np.int32)


def _derive_expr_vertex_idx(
    assets: SMPLXAssets,
    flame2019_path: Optional[str],
    face_vertex_idx: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Expression-driven face vertices.

    Real path: ``derive_expr_vertex_idx_flame2019`` (needs the FLAME-2019
    model file and the SMPL-X<->FLAME vertex correspondence). Without that
    file we use the grafted expr_dirs support of the model itself minus
    eye/neck-dominated verts — the same semantics computed from data already
    in the assets.
    """
    if flame2019_path is not None and osp.exists(flame2019_path):
        if face_vertex_idx is None:
            raise ValueError(
                "real FLAME-2019 derivation needs face_vertex_idx "
                "(SMPL-X__FLAME_vertex_ids.npy; see load_prior_tables)"
            )
        return derive_expr_vertex_idx_flame2019(flame2019_path, face_vertex_idx)
    support = (np.abs(np.asarray(assets.expr_dirs)).sum((1, 2)) > 0)
    nearest = np.asarray(assets.lbs_weights).argmax(1)
    eye_set = [SMPLX_JOINT_NAMES.index(n) for n in ("L_Eye", "R_Eye", "Neck")]
    keep = support & ~np.isin(nearest, eye_set)
    return np.where(keep)[0].astype(np.int32)


def load_prior_tables(human_model_path: str) -> dict:
    """Load the released correspondence tables the reference reads
    (MANO_SMPLX_vertex_ids.pkl, SMPL-X__FLAME_vertex_ids.npy,
    flame/2019/generic_model.pkl; reference smpl_x.py:21,26-30,115-137)."""
    out = {}
    p = osp.join(human_model_path, "smplx", "SMPL-X__FLAME_vertex_ids.npy")
    out["face_vertex_idx"] = np.load(p).astype(np.int32)
    with open(osp.join(human_model_path, "smplx", "MANO_SMPLX_vertex_ids.pkl"), "rb") as f:
        hand = pickle.load(f, encoding="latin1")
    out["lhand_vertex_idx"] = hand["left_hand"].astype(np.int32)
    out["rhand_vertex_idx"] = hand["right_hand"].astype(np.int32)
    flame2019 = osp.join(human_model_path, "flame", "2019", "generic_model.pkl")
    if osp.exists(flame2019):
        out["expr_vertex_idx"] = derive_expr_vertex_idx_flame2019(
            flame2019, out["face_vertex_idx"]
        )
    return out


def build_prior(
    assets: SMPLXAssets,
    lip_vertex_idx: Optional[Tuple[int, ...]] = None,
    face_vertex_idx: Optional[np.ndarray] = None,
    lhand_vertex_idx: Optional[np.ndarray] = None,
    rhand_vertex_idx: Optional[np.ndarray] = None,
    expr_vertex_idx: Optional[np.ndarray] = None,
    subdivide_levels: int = 2,
) -> SMPLXPrior:
    """Precompute the prior (reference SMPLX.__init__, smpl_x.py:16-54).

    With real assets pass the tables from ``load_prior_tables`` and
    ``lip_vertex_idx=REAL_LIP_VERTEX_IDX``; with synthetic assets everything
    is derived from skinning/blendshape support.
    """
    V = assets.num_vertices
    faces = np.asarray(assets.faces, np.int64)

    if lip_vertex_idx is None:
        if V > max(REAL_LIP_VERTEX_IDX):
            lip_vertex_idx = REAL_LIP_VERTEX_IDX
        else:
            # synthetic: 8 face-region verts nearest the jaw joint
            w = np.asarray(assets.lbs_weights)
            jaw = SMPLX_JOINT_NAMES.index("Jaw")
            lip_vertex_idx = tuple(np.argsort(-w[:, jaw])[:8].astype(int).tolist())

    is_cavity = np.zeros((V,), np.float32)
    is_cavity[list(lip_vertex_idx)] = 1.0
    cavity_faces = np.array(
        [[lip_vertex_idx[a], lip_vertex_idx[b], lip_vertex_idx[c]]
         for a, b, c in CAVITY_FACE_PATTERN],
        np.int64,
    )
    faces_with_cavity = np.concatenate([faces, cavity_faces], axis=0).astype(np.int32)

    derived_l, derived_r, derived_f = _derive_part_tables(assets)
    lhand_vertex_idx = derived_l if lhand_vertex_idx is None else lhand_vertex_idx
    rhand_vertex_idx = derived_r if rhand_vertex_idx is None else rhand_vertex_idx
    face_vertex_idx = derived_f if face_vertex_idx is None else face_vertex_idx
    if expr_vertex_idx is None:
        expr_vertex_idx = _derive_expr_vertex_idx(assets, None)

    # 大 pose (reference smpl_x.py:46-49): legs split, mouth open
    neutral_body_pose = np.zeros((21, 3), np.float32)
    neutral_body_pose[0] = (0.0, 0.0, 1.0)
    neutral_body_pose[1] = (0.0, 0.0, -1.0)
    neutral_jaw_pose = np.array([1.0 / 3.0, 0.0, 0.0], np.float32)

    ops, faces_hr, v_hr = build_subdivision(faces_with_cavity, V, subdivide_levels)

    def mask_from_idx(idx):
        m = np.zeros((V, 1), np.float32)
        m[np.asarray(idx, np.int64)] = 1.0
        return jnp.asarray(m)

    is_rhand_hr = upsample_features(ops, mask_from_idx(rhand_vertex_idx))[:, 0] > 0
    is_lhand_hr = upsample_features(ops, mask_from_idx(lhand_vertex_idx))[:, 0] > 0
    is_face_hr = upsample_features(ops, mask_from_idx(face_vertex_idx))[:, 0] > 0
    is_face_expr_hr = upsample_features(ops, mask_from_idx(expr_vertex_idx))[:, 0] > 0
    is_cavity_hr = upsample_features(ops, jnp.asarray(is_cavity)[:, None])[:, 0] > 0

    return SMPLXPrior(
        assets=assets,
        faces_with_cavity=jnp.asarray(faces_with_cavity),
        is_cavity=jnp.asarray(is_cavity),
        face_vertex_idx=jnp.asarray(np.asarray(face_vertex_idx, np.int32)),
        lhand_vertex_idx=jnp.asarray(np.asarray(lhand_vertex_idx, np.int32)),
        rhand_vertex_idx=jnp.asarray(np.asarray(rhand_vertex_idx, np.int32)),
        expr_vertex_idx=jnp.asarray(np.asarray(expr_vertex_idx, np.int32)),
        neutral_body_pose=jnp.asarray(neutral_body_pose),
        neutral_jaw_pose=jnp.asarray(neutral_jaw_pose),
        subdividers=tuple(ops),
        faces_upsampled=jnp.asarray(faces_hr),
        is_rhand_hr=is_rhand_hr,
        is_lhand_hr=is_lhand_hr,
        is_face_hr=is_face_hr,
        is_face_expr_hr=is_face_expr_hr,
        is_cavity_hr=is_cavity_hr,
        vertex_num_upsampled=int(v_hr),
    )
