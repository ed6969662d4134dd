"""FLAME head model tests: oracle parity + structure."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exavatar_release_tpu.models.smplx import (
    FLAME_PARENTS,
    FLAMEParams,
    flame_forward,
    synthetic_flame_assets,
)
from smplx_oracle import smplx_lbs_oracle


@pytest.fixture(scope="module")
def flame():
    return synthetic_flame_assets()


def test_matches_oracle(flame, rng):
    assets, _ = flame
    params = FLAMEParams(
        betas=jnp.asarray(rng.normal(0, 1, assets.num_shape), jnp.float32),
        expr=jnp.asarray(rng.normal(0, 1, assets.num_expr), jnp.float32),
        root_pose=jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32),
        neck_pose=jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32),
        jaw_pose=jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32),
        leye_pose=jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32),
        reye_pose=jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32),
        trans=jnp.asarray(rng.normal(0, 0.1, 3), jnp.float32),
    )
    out = flame_forward(assets, params, with_landmarks=False)
    verts_o, joints_o, _ = smplx_lbs_oracle(
        np.asarray(assets.v_template),
        np.asarray(assets.shapedirs),
        np.asarray(assets.expr_dirs),
        np.asarray(assets.posedirs),
        np.asarray(assets.joint_regressor),
        np.asarray(assets.lbs_weights),
        FLAME_PARENTS,
        np.asarray(params.betas),
        np.asarray(params.expr),
        np.asarray(params.full_pose()),
        trans=np.asarray(params.trans),
    )
    np.testing.assert_allclose(np.asarray(out.vertices), verts_o, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.joints), joints_o, atol=2e-5)


def test_landmarks_and_uv(flame, rng):
    assets, prior = flame
    params = FLAMEParams.zeros(assets.num_shape, assets.num_expr)
    out = flame_forward(assets, params, use_face_contour=True)
    L = assets.lmk_faces_idx.shape[0] + assets.dyn_lmk_faces_idx.shape[1]
    assert out.landmarks.shape == (L, 3)
    uv = np.asarray(prior.vertex_uv)
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    assert prior.face_uv.shape == assets.faces.shape


def test_jit_grad(flame, rng):
    assets, _ = flame
    params = FLAMEParams.zeros(assets.num_shape, assets.num_expr)

    @jax.jit
    def loss(expr):
        out = flame_forward(assets, params.replace(expr=expr), with_landmarks=False)
        return jnp.sum(out.vertices ** 2)

    g = jax.grad(loss)(params.expr + 0.5)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
