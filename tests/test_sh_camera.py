"""Golden-value tests: SH evaluation vs the reference formula table
(transforms.py:112-167 semantics) and camera/projection matrices."""
import numpy as np
import jax.numpy as jnp

from exavatar_release_tpu.core import sh, camera


def reference_eval_sh(deg, coeffs, dirs):
    """Direct transcription of the polynomial table for testing."""
    C0, C1, C2, C3, C4 = sh.C0, sh.C1, sh.C2, sh.C3, sh.C4
    result = C0 * coeffs[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result - C1 * y * coeffs[..., 1] + C1 * z * coeffs[..., 2] - C1 * x * coeffs[..., 3]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * coeffs[..., 4]
                + C2[1] * yz * coeffs[..., 5]
                + C2[2] * (2.0 * zz - xx - yy) * coeffs[..., 6]
                + C2[3] * xz * coeffs[..., 7]
                + C2[4] * (xx - yy) * coeffs[..., 8]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3 * xx - yy) * coeffs[..., 9]
                    + C3[1] * xy * z * coeffs[..., 10]
                    + C3[2] * y * (4 * zz - xx - yy) * coeffs[..., 11]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[..., 12]
                    + C3[4] * x * (4 * zz - xx - yy) * coeffs[..., 13]
                    + C3[5] * z * (xx - yy) * coeffs[..., 14]
                    + C3[6] * x * (xx - 3 * yy) * coeffs[..., 15]
                )
    return result


def test_eval_sh_matches_reference_formulas(rng):
    n = 32
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    coeffs = rng.normal(size=(n, 3, 16)).astype(np.float32)
    for deg in range(4):
        ours = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
        ref = reference_eval_sh(deg, coeffs, dirs)
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=f"deg={deg}")


def test_eval_sh_dynamic_matches_static(rng):
    n = 16
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    coeffs = rng.normal(size=(n, 3, 16)).astype(np.float32)
    for deg in range(4):
        static = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
        dyn = np.asarray(
            sh.eval_sh_dynamic(jnp.float32(deg), jnp.asarray(coeffs), jnp.asarray(dirs))
        )
        np.testing.assert_allclose(dyn, static, atol=1e-5)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(size=(10, 3)).astype(np.float32)
    back = np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_view_matrix_blocks(rng):
    R = np.asarray(
        jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    )  # arbitrary matrix is fine for block test
    t = rng.normal(size=(3,)).astype(np.float32)
    V = np.asarray(camera.get_view_matrix(jnp.asarray(R), jnp.asarray(t)))
    np.testing.assert_allclose(V[:3, :3], R, atol=1e-7)
    np.testing.assert_allclose(V[:3, 3], t, atol=1e-7)
    np.testing.assert_allclose(V[3], [0, 0, 0, 1], atol=1e-7)


def test_proj_matrix_matches_reference_formula():
    focal = jnp.array([500.0, 600.0])
    img_shape = (480, 640)
    z_near, z_far = 0.01, 100.0
    P = np.asarray(camera.get_proj_matrix(focal, img_shape, z_near, z_far))
    fov_x = 2 * np.arctan(640 / (2 * 500.0))
    fov_y = 2 * np.arctan(480 / (2 * 600.0))
    tx, ty = np.tan(fov_x / 2), np.tan(fov_y / 2)
    expected = np.zeros((4, 4), np.float32)
    expected[0, 0] = 2 * z_near / (2 * tx * z_near)
    expected[1, 1] = 2 * z_near / (2 * ty * z_near)
    expected[3, 2] = 1.0
    expected[2, 2] = z_far / (z_far - z_near)
    expected[2, 3] = -(z_far * z_near) / (z_far - z_near)
    np.testing.assert_allclose(P, expected, atol=1e-6)


def test_projection_pixel_agreement(rng):
    """Projecting through the clip-space path and the pixel path must agree
    (up to the half-pixel NDC convention) for centered principal points."""
    H, W = 256, 512
    focal = jnp.array([400.0, 400.0])
    princpt = jnp.array([W / 2.0, H / 2.0])
    R = jnp.eye(3)
    t = jnp.zeros(3)
    cam = camera.Camera(R=R, t=t, focal=focal, princpt=princpt)
    pts = jnp.asarray(
        np.concatenate(
            [rng.normal(size=(32, 2)).astype(np.float32) * 0.2, np.full((32, 1), 3.0, np.float32)],
            axis=1,
        )
    )
    pix = np.asarray(camera.cam_to_pixel(pts, focal, princpt))
    Pfull = camera.full_projection(cam, (H, W))
    hom = jnp.concatenate([pts, jnp.ones((32, 1))], axis=1) @ Pfull.T
    ndc = np.asarray(hom[:, :2] / hom[:, 3:4])
    # NDC in [-1,1] -> pixels
    px = (ndc[:, 0] + 1) * W / 2
    py = (ndc[:, 1] + 1) * H / 2
    np.testing.assert_allclose(px, pix[:, 0], atol=1e-2)
    np.testing.assert_allclose(py, pix[:, 1], atol=1e-2)


def test_world_cam_roundtrip(rng):
    from exavatar_release_tpu.core import rotations as rot

    aa = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    R = rot.axis_angle_to_matrix(aa)
    t = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    back = camera.cam_to_world(camera.world_to_cam(pts, R, t), R, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_look_at():
    eye = jnp.array([0.0, 0.0, -5.0])
    target = jnp.zeros(3)
    up = jnp.array([0.0, -1.0, 0.0])
    R, t = camera.look_at(eye, target, up)
    p_cam = np.asarray(camera.world_to_cam(target[None], R, t))[0]
    np.testing.assert_allclose(p_cam, [0, 0, 5.0], atol=1e-5)
