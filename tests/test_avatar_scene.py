"""Scene Gaussians: init, SH decode, fixed-capacity densify/prune."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exavatar_release_tpu.avatar.config import AvatarConfig
from exavatar_release_tpu.avatar import scene as sc
from exavatar_release_tpu.core.sh import C0


CFG = AvatarConfig(scene_capacity=256)


@pytest.fixture
def state(rng):
    xyz = jnp.asarray(rng.normal(0, 1, (100, 3)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (100, 3)).astype(np.float32))
    return sc.init_from_point_cloud(
        xyz, rgb, jnp.zeros(3), jnp.asarray(3.0), CFG.scene_capacity
    )


class TestInit:
    def test_init_values(self, state, rng):
        assert int(state.num_live) == 100
        assert state.capacity == 256
        # opacity decodes to 0.1 (reference module.py:100-102)
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(state.params.opacity[:100])), 0.1, atol=1e-5
        )
        # DC feature inverts to the input color
        rgb_back = np.asarray(state.params.feature_dc[:100, 0]) * C0 + 0.5
        assert rgb_back.min() >= 0 and rgb_back.max() <= 1

    def test_assets_sh0_color(self, state):
        R = jnp.eye(3)
        t = jnp.asarray([0.0, 0.0, 5.0])
        assets = sc.scene_assets(state, R, t)
        # at SH degree 0, rgb = DC*C0 + 0.5 regardless of view dir
        expect = np.asarray(state.params.feature_dc[:100, 0]) * C0 + 0.5
        np.testing.assert_allclose(
            np.asarray(assets.rgb[:100]), np.maximum(expect, 0.0), atol=1e-5
        )
        # dead rows are masked out
        assert not bool(assets.live[100:].any())

    def test_sh_degree_changes_color(self, state, rng):
        state2 = state._replace(
            params=state.params.replace(
                feature_rest=jnp.asarray(
                    rng.normal(0, 0.3, state.params.feature_rest.shape).astype(np.float32)
                )
            )
        )
        a0 = sc.scene_assets(state2, jnp.eye(3), jnp.asarray([0.0, 0, 5.0]))
        state3 = sc.set_sh_degree(state2, 2000, CFG)
        a2 = sc.scene_assets(state3, jnp.eye(3), jnp.asarray([0.0, 0, 5.0]))
        assert not np.allclose(np.asarray(a0.rgb[:100]), np.asarray(a2.rgb[:100]))


class TestDensify:
    def test_clone_small_hot_points(self, state):
        aux = state.aux.replace(
            xyz_grad_accum=jnp.full((256,), 1.0),
            track_cnt=jnp.full((256,), 1.0),
        )
        # small scales -> clone path (scale thr = 0.01 * 3.0)
        params = state.params.replace(scale=jnp.full((256, 3), jnp.log(1e-4)))
        st = sc.SceneState(params, aux)
        res = sc.densify_and_prune(st, jax.random.PRNGKey(0), CFG, False)
        assert int(res.n_cloned) == 100
        assert int(res.n_split) == 0
        assert int(res.state.num_live) == 200
        # clones copy the source position
        live_new = np.asarray(res.state.aux.live) & ~np.asarray(state.aux.live)
        src_means = np.sort(np.asarray(state.params.mean[:100]), axis=0)
        new_means = np.sort(np.asarray(res.state.params.mean)[live_new], axis=0)
        np.testing.assert_allclose(new_means, src_means, atol=1e-6)
        # reset mask covers exactly the new rows
        assert np.array_equal(np.asarray(res.reset_mask), live_new)

    def test_split_large_hot_points(self, state):
        aux = state.aux.replace(
            xyz_grad_accum=jnp.full((256,), 1.0),
            track_cnt=jnp.full((256,), 1.0),
        )
        params = state.params.replace(scale=jnp.full((256, 3), jnp.log(0.5)))
        st = sc.SceneState(params, aux)
        res = sc.densify_and_prune(st, jax.random.PRNGKey(0), CFG, False)
        assert int(res.n_split) == 100
        # originals die, 2 children each: live = 200
        assert int(res.state.num_live) == 200
        # children carry shrunken scale log(0.5/1.6)
        live = np.asarray(res.state.aux.live)
        np.testing.assert_allclose(
            np.asarray(res.state.params.scale)[live],
            np.log(0.5 / 1.6),
            atol=1e-5,
        )

    def test_prune_low_opacity(self, state):
        params = state.params.replace(
            opacity=state.params.opacity.at[:50].set(-10.0)  # sigmoid ~ 0
        )
        st = sc.SceneState(params, state.aux)
        res = sc.densify_and_prune(st, jax.random.PRNGKey(0), CFG, False)
        assert int(res.n_pruned) == 50
        assert int(res.state.num_live) == 50

    def test_screen_size_prune(self, state):
        aux = state.aux.replace(radius_max=state.aux.radius_max.at[:10].set(25.0))
        # keep world scales under 0.1*cam_dist_radius so only the
        # screen-radius criterion fires
        params = state.params.replace(scale=jnp.full((256, 3), jnp.log(1e-3)))
        st = sc.SceneState(params, aux)
        res = sc.densify_and_prune(st, jax.random.PRNGKey(0), CFG, True, 20.0)
        assert int(res.state.num_live) == 90

    def test_capacity_overflow_drops(self, rng):
        cfg = AvatarConfig(scene_capacity=128)
        xyz = jnp.asarray(rng.normal(0, 1, (100, 3)).astype(np.float32))
        rgb = jnp.asarray(rng.uniform(0, 1, (100, 3)).astype(np.float32))
        st = sc.init_from_point_cloud(xyz, rgb, jnp.zeros(3), jnp.asarray(3.0), 128)
        aux = st.aux.replace(
            xyz_grad_accum=jnp.full((128,), 1.0), track_cnt=jnp.full((128,), 1.0)
        )
        params = st.params.replace(scale=jnp.full((128, 3), jnp.log(1e-4)))
        res = sc.densify_and_prune(
            sc.SceneState(params, aux), jax.random.PRNGKey(0), cfg, False
        )
        # 100 clones requested, only 28 free slots
        assert int(res.n_dropped) == 72
        assert int(res.state.num_live) == 128

    def test_track_stats_and_reset(self, state):
        g = jnp.ones((256, 2))
        vis = state.aux.live
        st = sc.track_stats(state, g, vis, jnp.full((256,), 5.0))
        assert float(st.aux.xyz_grad_accum[0]) == pytest.approx(np.sqrt(2), rel=1e-5)
        assert float(st.aux.track_cnt[0]) == 1.0
        assert float(st.aux.radius_max[0]) == 5.0
        # dead rows untouched
        assert float(st.aux.track_cnt[200]) == 0.0

    def test_reset_opacity(self, state):
        st, mask = sc.reset_opacity(state)
        op = np.asarray(jax.nn.sigmoid(st.params.opacity[:100, 0]))
        assert (op <= 0.01 + 1e-6).all()
        assert mask.all()

    def test_densify_jits(self, state):
        fn = jax.jit(
            lambda s, k: sc.densify_and_prune(s, k, CFG, False), static_argnums=()
        )
        res = fn(state, jax.random.PRNGKey(1))
        assert res.state.capacity == 256
