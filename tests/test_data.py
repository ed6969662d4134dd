"""Data layer: COLMAP text parsing + subject directory loading."""
import json
import os
import os.path as osp

import numpy as np
import pytest

from exavatar_release_tpu.data import (
    bbox_from_keypoints,
    camera_distribution,
    load_subject,
    parse_cameras_txt,
    parse_images_txt,
    parse_points3d_txt,
)
from exavatar_release_tpu.data.subject import load_frame_arrays


def make_synthetic_subject(root, n_frames=3, H=32, W=40, seed=0):
    """Write a reference-layout subject directory with synthetic content."""
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(osp.join(root, "sparse"), exist_ok=True)
    for d in ("images", "masks", "keypoints_whole_body",
              "smplx_optimized/smplx_params"):
        os.makedirs(osp.join(root, d), exist_ok=True)

    with open(osp.join(root, "sparse", "cameras.txt"), "w") as f:
        f.write("# cameras\n")
        f.write(f"1 PINHOLE {W} {H} 60.0 61.0 {W/2} {H/2}\n")
    with open(osp.join(root, "sparse", "images.txt"), "w") as f:
        f.write("# images\n")
        for i in range(n_frames):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3) * 0.1
            f.write(
                f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 {i}.png\n"
            )
            f.write("0 0 -1\n")  # points2d line (ignored)
    with open(osp.join(root, "sparse", "points3D.txt"), "w") as f:
        f.write("# points\n")
        for i in range(50):
            x, y = rng.normal(size=2)
            z = rng.uniform(2, 20)  # some far outliers to cut
            r, g, b = rng.integers(0, 255, 3)
            f.write(f"{i} {x} {y} {z} {r} {g} {b} 0.1\n")

    for i in range(n_frames):
        img = rng.integers(0, 255, (H, W, 3), np.uint8)
        cv2.imwrite(osp.join(root, "images", f"{i}.png"), img)
        mask = np.zeros((H, W, 3), np.uint8)
        mask[H // 4 : 3 * H // 4, W // 4 : 3 * W // 4] = 255
        cv2.imwrite(osp.join(root, "masks", f"{i}.png"), mask)
        kpt = np.concatenate(
            [rng.uniform(5, 30, (135, 2)), rng.uniform(0.4, 1.0, (135, 1))], 1
        )
        with open(osp.join(root, "keypoints_whole_body", f"{i}.json"), "w") as f:
            json.dump(kpt.tolist(), f)
        params = {
            "root_pose": rng.normal(0, 0.1, 3).tolist(),
            "body_pose": rng.normal(0, 0.1, (21, 3)).tolist(),
            "jaw_pose": rng.normal(0, 0.1, 3).tolist(),
            "leye_pose": [0, 0, 0], "reye_pose": [0, 0, 0],
            "lhand_pose": rng.normal(0, 0.1, (15, 3)).tolist(),
            "rhand_pose": rng.normal(0, 0.1, (15, 3)).tolist(),
            "expr": rng.normal(0, 0.3, 8).tolist(),  # matches default synthetic prior num_expr
            "trans": [0.0, 0.1, 2.5],
        }
        with open(
            osp.join(root, "smplx_optimized", "smplx_params", f"{i}.json"), "w"
        ) as f:
            json.dump(params, f)
    # detector-init layouts for the fitting chain (Hand4Whole / DECA)
    for d in ("smplx_init", "flame_init"):
        os.makedirs(osp.join(root, d), exist_ok=True)
    for i in range(n_frames):
        with open(osp.join(root, "smplx_init", f"{i}.json"), "w") as f:
            json.dump({
                "root_pose": rng.normal(0, 0.1, 3).tolist(),
                "body_pose": rng.normal(0, 0.1, (21, 3)).tolist(),
                "lhand_pose": rng.normal(0, 0.1, (15, 3)).tolist(),
                "rhand_pose": rng.normal(0, 0.1, (15, 3)).tolist(),
                "trans": [0.0, 0.0, 3.0],
            }, f)
        with open(osp.join(root, "flame_init", f"{i}.json"), "w") as f:
            json.dump({
                "root_pose": rng.normal(0, 0.1, 3).tolist(),
                "neck_pose": rng.normal(0, 0.1, 3).tolist(),
                "jaw_pose": rng.normal(0, 0.1, 3).tolist(),
                "leye_pose": [0, 0, 0], "reye_pose": [0, 0, 0],
                "expr": rng.normal(0, 0.3, 8).tolist(),
                "trans": [0.0, 0.0, 3.0],
            }, f)
    with open(osp.join(root, "flame_init", "shape_param.json"), "w") as f:
        json.dump(np.zeros(6).tolist(), f)
    with open(osp.join(root, "train_split.txt"), "w") as f:
        f.write("".join(f"{i}.png\n" for i in range(n_frames)))
    for name, shape in (
        ("shape_param.json", (6,)), ("face_offset.json", (10, 3)),
        ("joint_offset.json", (55, 3)), ("locator_offset.json", (55, 3)),
    ):
        with open(osp.join(root, "smplx_optimized", name), "w") as f:
            json.dump(np.zeros(shape).tolist(), f)
    return root


class TestColmap:
    def test_parse(self, tmp_path):
        root = make_synthetic_subject(str(tmp_path))
        focal, princpt = parse_cameras_txt(osp.join(root, "sparse", "cameras.txt"))
        np.testing.assert_allclose(focal, [60.0, 61.0])
        extr = parse_images_txt(osp.join(root, "sparse", "images.txt"))
        assert len(extr) == 3
        R = extr[0]["R"]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        pts = parse_points3d_txt(osp.join(root, "sparse", "points3D.txt"))
        assert pts.shape[1] == 6
        assert pts.shape[0] < 50  # z-quantile filtering removed outliers
        assert pts[:, 3:].max() <= 1.0


class TestSubject:
    def test_load_subject_and_frames(self, tmp_path):
        root = make_synthetic_subject(str(tmp_path))
        subject = load_subject(root, split="train", repeat=2)
        assert len(subject.frame_ids) == 6  # 3 frames x2
        assert len(subject.smplx_params) == 3
        assert subject.cam_dist_radius > 0
        assert subject.shape_param is not None

        arrs = load_frame_arrays(subject, 0)
        assert arrs["img"].shape == (3, 32, 40)
        assert arrs["mask"].shape == (1, 32, 40)
        assert set(np.unique(arrs["mask"])) <= {0.0, 1.0}
        assert arrs["bbox"].shape == (4,)

    def test_bbox_from_keypoints(self):
        kpt = np.asarray([[10.0, 20.0], [30.0, 40.0]])
        valid = np.asarray([1.0, 1.0])
        bbox = bbox_from_keypoints(kpt, valid)
        # extended by 1.2 around center (20, 30)
        np.testing.assert_allclose(bbox, [8.0, 18.0, 24.0, 24.0])

    def test_camera_distribution(self):
        cams = {
            0: {"R": np.eye(3, dtype=np.float32), "t": np.zeros(3, np.float32)},
            1: {"R": np.eye(3, dtype=np.float32),
                "t": np.asarray([2.0, 0, 0], np.float32)},
        }
        trans, radius = camera_distribution(cams)
        np.testing.assert_allclose(trans, [1.0, 0, 0], atol=1e-6)
        assert radius == pytest.approx(1.1, rel=1e-5)


class TestFittingInit:
    def test_trans_init_scale_relation(self):
        from exavatar_release_tpu.data.fitting_init import smplx_trans_init

        # a body of size 2m filling a 200px box at f=400 sits at z=4
        kpt = np.asarray([[300.0, 300.0, 1.0], [500.0, 500.0, 1.0]])
        t = smplx_trans_init(kpt, np.asarray([400.0, 400.0]),
                             np.asarray([400.0, 400.0]), body_3d_size=2.0)
        # bbox extends 200*1.2 = 240 -> t_z = sqrt(400*400*4/240^2) = 3.33
        assert t[2] == pytest.approx(400 * 2 / 240, rel=1e-4)
        assert abs(t[0]) < 0.2 and abs(t[1]) < 0.2  # centered bbox

    def test_flame_root_init_recovers_rotation(self, rng):
        from exavatar_release_tpu.data.fitting_init import flame_root_init
        from exavatar_release_tpu.core.rotations import axis_angle_to_matrix
        import jax.numpy as jnp

        flame_v = rng.normal(0, 0.1, (40, 3)).astype(np.float32)
        # smplx face region IS the flame template rotated by a known R
        aa = np.asarray([0.3, -0.2, 0.5], np.float32)
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        smplx_v = rng.normal(0, 0.5, (100, 3)).astype(np.float32)
        fv_idx = np.arange(40)
        # construct smplx template so that root-posed face region equals
        # R' @ flame (R' = total rotation after root pose)
        root = np.zeros(3, np.float32)
        smplx_v[:40] = flame_v @ R.T
        trans = np.asarray([0.1, 0.2, 3.0], np.float32)
        rp, tr = flame_root_init(root, trans, smplx_v, fv_idx, flame_v)
        R_est = np.asarray(axis_angle_to_matrix(jnp.asarray(rp)))
        np.testing.assert_allclose(R_est, R, atol=1e-3)

    def test_world_to_cam_root_pose(self, rng):
        from exavatar_release_tpu.data.fitting_init import world_to_cam_root_pose
        from exavatar_release_tpu.core.rotations import axis_angle_to_matrix
        import jax.numpy as jnp

        aa = rng.normal(0, 0.5, 3).astype(np.float32)
        camR = np.asarray(
            np.linalg.qr(rng.normal(size=(3, 3)))[0], np.float32
        )
        if np.linalg.det(camR) < 0:
            camR[:, 0] *= -1
        out = world_to_cam_root_pose(aa, camR)
        R_out = np.asarray(axis_angle_to_matrix(jnp.asarray(out)))
        R_in = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        np.testing.assert_allclose(R_out, camR @ R_in, atol=1e-5)


class TestDepthCloud:
    def test_align_and_backproject(self, rng):
        import jax.numpy as jnp

        from exavatar_release_tpu.data.depth_cloud import (
            BkgCloudAccumulator,
            align_depth_to_smplx,
            render_smplx_depth,
        )

        H, W = 32, 40
        # mesh depth render: a triangle at z=2
        verts = np.asarray([[-0.3, -0.3, 2.0], [0.3, -0.3, 2.0], [0.0, 0.4, 2.0]],
                           np.float32)
        faces = np.asarray([[0, 1, 2]], np.int32)
        sd = render_smplx_depth(verts, faces, [50.0, 50.0], [W / 2, H / 2], (H, W))
        assert (sd > 0).sum() > 20
        np.testing.assert_allclose(sd[sd > 0], 2.0, atol=1e-3)

        # relative depth = affine transform of a known metric field
        true_depth = np.full((H, W), 4.0, np.float32)
        true_depth[sd > 0] = 2.0
        rel = 10.0 - 3.0 * true_depth  # arbitrary affine, low = close inverted
        rel = -rel  # make LOW = close like the reference's 255-d
        aligned = align_depth_to_smplx(rel, sd)
        # mesh pixels recover metric depth exactly (affine family)
        np.testing.assert_allclose(aligned[sd > 0], 2.0, atol=1e-4)

        acc = BkgCloudAccumulator((H, W))
        img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        mask = (sd > 0).astype(np.float32)
        acc.add(aligned, img, mask)
        cloud = acc.point_cloud([50.0, 50.0], [W / 2, H / 2])
        assert cloud.shape[1] == 6
        assert cloud.shape[0] == int((mask < 0.5).sum())
        # center background pixel back-projects to its depth
        assert np.isfinite(cloud).all()


class TestCropIntrinsics:
    def test_projection_consistency(self):
        """Projecting with cropped intrinsics equals projecting with the
        original camera then mapping into crop space."""
        from exavatar_release_tpu.data.fitting_init import (
            crop_camera_intrinsics,
            keypoints_to_crop,
        )

        focal = np.asarray([500.0, 510.0])
        princpt = np.asarray([320.0, 240.0])
        bbox = np.asarray([100.0, 80.0, 200.0, 200.0])  # square (reference)
        pts = np.asarray([[0.2, 0.1, 3.0], [-0.1, 0.3, 2.5]])
        px = pts[:, 0] / pts[:, 2] * focal[0] + princpt[0]
        py = pts[:, 1] / pts[:, 2] * focal[1] + princpt[1]

        f2, p2 = crop_camera_intrinsics(focal, princpt, bbox, (8, 8))
        qx = pts[:, 0] / pts[:, 2] * f2[0] + p2[0]
        qy = pts[:, 1] / pts[:, 2] * f2[1] + p2[1]
        mapped = keypoints_to_crop(np.stack([px, py], 1), bbox, (8, 8))
        np.testing.assert_allclose(qx, mapped[:, 0], rtol=1e-5)
        np.testing.assert_allclose(qy, mapped[:, 1], rtol=1e-5)
