"""Differential tests for the JAX SMPL-X layer vs an independent numpy oracle.

The reference ships no tests (SURVEY.md §4); strategy here is golden-value
testing of LBS/FK/subdivision semantics against tests/smplx_oracle.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exavatar_release_tpu.models.smplx import (
    SMPLX_PARENTS,
    SMPLXParams,
    build_prior,
    build_subdivision,
    midpoint_subdivide,
    smplx_forward,
    synthetic_smplx_assets,
    upsample_features,
)
from smplx_oracle import smplx_lbs_oracle


@pytest.fixture(scope="module")
def assets():
    return synthetic_smplx_assets(rings=10, segs=14, num_shape=8, num_expr=4)


@pytest.fixture(scope="module")
def prior(assets):
    return build_prior(assets)


def _random_params(assets, rng, scale=0.4):
    return SMPLXParams(
        betas=jnp.asarray(rng.normal(0, 1.0, assets.num_shape), jnp.float32),
        expr=jnp.asarray(rng.normal(0, 1.0, assets.num_expr), jnp.float32),
        root_pose=jnp.asarray(rng.normal(0, scale, 3), jnp.float32),
        body_pose=jnp.asarray(rng.normal(0, scale, (21, 3)), jnp.float32),
        jaw_pose=jnp.asarray(rng.normal(0, scale, 3), jnp.float32),
        leye_pose=jnp.asarray(rng.normal(0, scale, 3), jnp.float32),
        reye_pose=jnp.asarray(rng.normal(0, scale, 3), jnp.float32),
        lhand_pose=jnp.asarray(rng.normal(0, scale, (15, 3)), jnp.float32),
        rhand_pose=jnp.asarray(rng.normal(0, scale, (15, 3)), jnp.float32),
        trans=jnp.asarray(rng.normal(0, 1.0, 3), jnp.float32),
    )


class TestLBS:
    def test_matches_oracle(self, assets, rng):
        params = _random_params(assets, rng)
        J = assets.num_joints
        face_off = rng.normal(0, 0.01, (assets.num_vertices, 3)).astype(np.float32)
        joint_off = rng.normal(0, 0.01, (J, 3)).astype(np.float32)
        loc_off = rng.normal(0, 0.01, (J, 3)).astype(np.float32)

        out = smplx_forward(
            assets,
            params,
            face_offset=jnp.asarray(face_off),
            joint_offset=jnp.asarray(joint_off),
            locator_offset=jnp.asarray(loc_off),
            with_landmarks=False,
        )

        full_pose = np.asarray(params.full_pose()) + np.asarray(
            assets.pose_mean
        ).reshape(-1, 3)
        verts_o, joints_o, A_o = smplx_lbs_oracle(
            np.asarray(assets.v_template),
            np.asarray(assets.shapedirs),
            np.asarray(assets.expr_dirs),
            np.asarray(assets.posedirs),
            np.asarray(assets.joint_regressor),
            np.asarray(assets.lbs_weights),
            SMPLX_PARENTS,
            np.asarray(params.betas),
            np.asarray(params.expr),
            full_pose,
            face_offset=face_off,
            joint_offset=joint_off,
            locator_offset=loc_off,
            trans=np.asarray(params.trans),
        )
        np.testing.assert_allclose(np.asarray(out.vertices), verts_o, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.joints), joints_o, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.rel_transforms), A_o, atol=2e-5)

    def test_zero_pose_is_rest(self, assets):
        params = SMPLXParams.zeros(assets.num_shape, assets.num_expr)
        out = smplx_forward(
            assets, params, with_landmarks=False, apply_pose_mean=False
        )
        # zero pose, zero shape: vertices == template
        np.testing.assert_allclose(
            np.asarray(out.vertices), np.asarray(assets.v_template), atol=1e-5
        )

    def test_locator_offset_only_moves_joints(self, assets, rng):
        params = _random_params(assets, rng)
        loc = jnp.asarray(rng.normal(0, 0.05, (assets.num_joints, 3)), jnp.float32)
        out0 = smplx_forward(assets, params, with_landmarks=False)
        out1 = smplx_forward(
            assets, params, locator_offset=loc, with_landmarks=False
        )
        np.testing.assert_allclose(
            np.asarray(out0.vertices), np.asarray(out1.vertices), atol=1e-6
        )
        assert not np.allclose(np.asarray(out0.joints), np.asarray(out1.joints))

    def test_jit_vmap_batch(self, assets, rng):
        params = [_random_params(assets, rng) for _ in range(3)]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        fwd = jax.jit(
            jax.vmap(
                lambda p: smplx_forward(assets, p, with_landmarks=True).vertices
            )
        )
        vb = fwd(batched)
        for i, p in enumerate(params):
            vi = smplx_forward(assets, p, with_landmarks=False).vertices
            np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(vi), atol=1e-5)

    def test_grad_flows(self, assets, rng):
        params = _random_params(assets, rng)

        def loss(betas):
            out = smplx_forward(
                assets, params.replace(betas=betas), with_landmarks=False
            )
            return jnp.sum(out.vertices ** 2)

        g = jax.grad(loss)(params.betas)
        assert np.all(np.isfinite(np.asarray(g)))
        # finite-difference check on one coordinate
        eps = 1e-3
        e0 = jnp.zeros_like(params.betas).at[0].set(eps)
        fd = (loss(params.betas + e0) - loss(params.betas - e0)) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=2e-2, atol=1e-3)

    def test_landmarks_barycentric(self, assets, rng):
        params = _random_params(assets, rng)
        out = smplx_forward(
            assets, params, with_landmarks=True, use_face_contour=False
        )
        L = assets.lmk_faces_idx.shape[0]
        assert out.landmarks.shape == (L, 3)
        # manual bary interp of landmark 0
        f = int(assets.lmk_faces_idx[0])
        tri = np.asarray(out.vertices)[np.asarray(assets.faces)[f]]
        expect = np.asarray(assets.lmk_bary_coords)[0] @ tri
        np.testing.assert_allclose(np.asarray(out.landmarks[0]), expect, atol=1e-5)

    def test_dynamic_contour_appended(self, assets, rng):
        params = _random_params(assets, rng)
        out = smplx_forward(assets, params, use_face_contour=True)
        L = assets.lmk_faces_idx.shape[0]
        C = assets.dyn_lmk_faces_idx.shape[1]
        assert out.landmarks.shape == (L + C, 3)


class TestSubdivision:
    def test_midpoint_invariants(self, assets):
        faces = np.asarray(assets.faces)
        V = assets.num_vertices
        op = midpoint_subdivide(faces, V)
        # low-res verts first
        feats = jnp.asarray(
            np.random.default_rng(1).normal(size=(V, 5)).astype(np.float32)
        )
        up = op.apply(feats)
        np.testing.assert_allclose(np.asarray(up[:V]), np.asarray(feats))
        # midpoints exact
        pairs = np.asarray(op.edge_pairs)
        np.testing.assert_allclose(
            np.asarray(up[V:]),
            0.5 * (np.asarray(feats)[pairs[:, 0]] + np.asarray(feats)[pairs[:, 1]]),
            atol=1e-7,
        )
        # 4x face count, all vertex ids in range, every new vertex used
        fo = np.asarray(op.faces_out)
        assert fo.shape == (4 * faces.shape[0], 3)
        assert fo.min() >= 0 and fo.max() == op.num_verts_out - 1
        assert set(range(V, op.num_verts_out)) <= set(fo.reshape(-1).tolist())

    def test_two_level_composition(self, assets):
        faces = np.asarray(assets.faces)
        V = assets.num_vertices
        ops, faces_hr, v_hr = build_subdivision(faces, V, levels=2)
        assert faces_hr.shape[0] == 16 * faces.shape[0]
        verts = assets.v_template
        up = upsample_features(ops, verts)
        assert up.shape == (v_hr, 3)
        # subdividing a planar feature keeps it planar (affine invariance)
        plane = verts @ jnp.asarray(np.array([[1.0], [2.0], [3.0]], np.float32)) + 5.0
        up_plane = upsample_features(ops, plane)
        expect = up @ jnp.asarray(np.array([[1.0], [2.0], [3.0]], np.float32)) + 5.0
        np.testing.assert_allclose(np.asarray(up_plane), np.asarray(expect), atol=1e-5)


class TestPrior:
    def test_shapes_and_masks(self, assets, prior):
        V = assets.num_vertices
        F = np.asarray(assets.faces).shape[0]
        assert prior.faces_with_cavity.shape == (F + 6, 3)
        assert prior.vertex_num_upsampled > V
        assert prior.faces_upsampled.shape[0] == 16 * (F + 6)
        for m in (prior.is_rhand_hr, prior.is_lhand_hr, prior.is_face_hr):
            assert m.shape == (prior.vertex_num_upsampled,)
        # hands are disjoint
        assert not np.any(
            np.asarray(prior.is_rhand_hr) & np.asarray(prior.is_lhand_hr)
        )
        # low-res prefix of hr masks matches the low-res index tables
        lr_rhand = np.zeros(V, bool)
        lr_rhand[np.asarray(prior.rhand_vertex_idx)] = True
        assert np.all(np.asarray(prior.is_rhand_hr)[:V] == lr_rhand)

    def test_joint_offset_root_zeroed(self, prior, rng):
        jo = jnp.asarray(rng.normal(0, 1, (prior.joint_num, 3)), jnp.float32)
        out = prior.apply_joint_offset_weight(jo)
        assert np.allclose(np.asarray(out[0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[1:]), np.asarray(jo[1:]))

    def test_neutral_pose_constants(self, prior):
        nbp = np.asarray(prior.neutral_body_pose)
        np.testing.assert_allclose(nbp[0], [0, 0, 1])
        np.testing.assert_allclose(nbp[1], [0, 0, -1])
        assert np.allclose(nbp[2:], 0)
        np.testing.assert_allclose(
            np.asarray(prior.neutral_jaw_pose), [1 / 3, 0, 0], atol=1e-6
        )

    def test_arm_segmentation(self, assets, prior):
        params = SMPLXParams.zeros(assets.num_shape, assets.num_expr)
        params = params.replace(body_pose=params.body_pose.at[:2].set(
            prior.neutral_body_pose[:2]
        ))
        out = smplx_forward(assets, params, with_landmarks=False)
        verts_hr = prior.upsample_mesh(out.vertices)
        w_hr = prior.upsample_mesh(assets.lbs_weights)
        is_up, is_low = prior.get_arm(verts_hr, w_hr)
        assert is_up.shape == (prior.vertex_num_upsampled,)
        assert not np.any(np.asarray(is_up) & np.asarray(is_low))
