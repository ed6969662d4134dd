"""Independent numpy oracle for SMPL-X LBS semantics.

A from-scratch scalar/loop transcription of the published SMPL-X equations
(shape blendshapes, pose correctives, FK, skinning — the semantics of
reference avatar/common/utils/smplx/smplx/lbs.py), deliberately written in
the dumbest possible style so that bugs don't correlate with the vectorized
JAX implementation under test.
"""
import numpy as np


def rodrigues(v):
    """(3,) axis-angle -> (3, 3)."""
    angle = np.linalg.norm(v)
    if angle < 1e-10:
        K = np.array(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float64
        )
        return np.eye(3) + K
    axis = v / angle
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ],
        np.float64,
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def forward_kinematics(rot_mats, joints, parents):
    """Returns (posed_joints (J,3), rel_transforms (J,4,4))."""
    J = len(parents)
    world = [None] * J
    for i in range(J):
        T = np.eye(4)
        T[:3, :3] = rot_mats[i]
        if i == 0:
            T[:3, 3] = joints[i]
            world[i] = T
        else:
            T[:3, 3] = joints[i] - joints[parents[i]]
            world[i] = world[parents[i]] @ T
    posed = np.stack([world[i][:3, 3] for i in range(J)])
    rel = []
    for i in range(J):
        A = world[i].copy()
        A[:3, 3] -= world[i][:3, :3] @ joints[i]
        rel.append(A)
    return posed, np.stack(rel)


def smplx_lbs_oracle(
    v_template,
    shapedirs,
    expr_dirs,
    posedirs,
    joint_regressor,
    lbs_weights,
    parents,
    betas,
    expr,
    full_pose_aa,
    face_offset=None,
    joint_offset=None,
    locator_offset=None,
    trans=None,
):
    """Full LBS. full_pose_aa: (J, 3) axis-angle (pose_mean already added)."""
    v = v_template.astype(np.float64).copy()
    if face_offset is not None:
        v = v + face_offset
    V = v.shape[0]
    # shape + expression blendshapes, one scalar loop
    disp = np.zeros_like(v)
    for c in range(betas.shape[0]):
        disp += betas[c] * shapedirs[:, :, c]
    for c in range(expr.shape[0]):
        disp += expr[c] * expr_dirs[:, :, c]
    v_shaped = v + disp

    joints = joint_regressor @ v_shaped
    if joint_offset is not None:
        joints = joints + joint_offset

    J = len(parents)
    rot_mats = np.stack([rodrigues(full_pose_aa[i]) for i in range(J)])
    pose_feature = np.concatenate(
        [(rot_mats[i] - np.eye(3)).reshape(-1) for i in range(1, J)]
    )
    pose_offsets = (pose_feature @ posedirs).reshape(V, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = forward_kinematics(rot_mats, joints, parents)
    if locator_offset is not None:
        posed_joints, _ = forward_kinematics(
            rot_mats, joints + locator_offset, parents
        )

    verts = np.zeros((V, 3))
    for i in range(V):
        T = np.zeros((4, 4))
        for j in range(J):
            if lbs_weights[i, j] != 0:
                T += lbs_weights[i, j] * A[j]
        vh = T @ np.array([*v_posed[i], 1.0])
        verts[i] = vh[:3]

    if trans is not None:
        verts = verts + trans
        posed_joints = posed_joints + trans
    return verts, posed_joints, A
