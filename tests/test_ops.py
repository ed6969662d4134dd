"""Tests for KNN, grid sampling, MLP layers, and the mesh rasterizer.

grid_sample/group_norm are differential-tested against torch CPU (the
semantics the reference relies on); KNN against numpy brute force; the mesh
rasterizer against analytic expectations on simple geometry.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exavatar_release_tpu.ops.knn import knn, mean_knn_dist_sq
from exavatar_release_tpu.ops.grid_sample import grid_sample_2d, triplane_sample
from exavatar_release_tpu.ops.mesh_raster import (
    MeshFragments,
    rasterize_mesh,
    render_textured_mesh,
    sample_uv_texture,
)
from exavatar_release_tpu.nn import apply_mlp, group_norm, init_mlp


class TestKNN:
    def test_vs_numpy_bruteforce(self, rng):
        q = rng.normal(size=(100, 3)).astype(np.float32)
        r = rng.normal(size=(237, 3)).astype(np.float32)
        res = knn(jnp.asarray(q), jnp.asarray(r), k=5, chunk=32)
        d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
        idx_np = np.argsort(d2, axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(res.idx), idx_np)
        np.testing.assert_allclose(
            np.asarray(res.dists), np.sort(d2, axis=1)[:, :5], atol=1e-4
        )

    def test_ref_mask_excludes_dead(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        mask = np.ones(50, bool)
        mask[10:] = False  # only first 10 are live
        res = knn(jnp.asarray(pts), jnp.asarray(pts), k=3, ref_mask=jnp.asarray(mask))
        assert np.asarray(res.idx).max() < 10

    def test_scale_init_stat(self, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        d = mean_knn_dist_sq(jnp.asarray(pts), k=4, chunk=16)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        expect = np.maximum(np.sort(d2, axis=1)[:, 1:4].mean(1), 1e-7)
        np.testing.assert_allclose(np.asarray(d), expect, rtol=1e-4)


class TestGridSample:
    def test_vs_torch(self, rng):
        import torch
        import torch.nn.functional as TF

        feat = rng.normal(size=(7, 9, 13)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(50, 2)).astype(np.float32)
        out = grid_sample_2d(jnp.asarray(feat), jnp.asarray(coords))
        t = TF.grid_sample(
            torch.from_numpy(feat)[None],
            torch.from_numpy(coords)[None, :, None, :],
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )[0, :, :, 0].T
        np.testing.assert_allclose(np.asarray(out), t.numpy(), atol=1e-5)

    def test_triplane_grad(self, rng):
        tri = jnp.asarray(rng.normal(size=(3, 4, 8, 8)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32))
        half = jnp.ones(3)

        def f(t):
            return jnp.sum(triplane_sample(t, xyz, half) ** 2)

        g = jax.grad(f)(tri)
        assert np.isfinite(np.asarray(g)).all()
        assert np.any(np.asarray(g) != 0)
        out = triplane_sample(tri, xyz, half)
        assert out.shape == (20, 12)


class TestMLP:
    def test_group_norm_vs_torch(self, rng):
        import torch

        x = rng.normal(size=(10, 16)).astype(np.float32)
        scale = rng.normal(size=(16,)).astype(np.float32)
        bias = rng.normal(size=(16,)).astype(np.float32)
        out = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 4)
        gn = torch.nn.GroupNorm(4, 16)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(scale))
            gn.bias.copy_(torch.from_numpy(bias))
        expect = gn(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_mlp_vs_torch_stack(self, rng):
        """apply_mlp must equal the reference make_linear_layers semantics."""
        import torch

        dims = [12, 32, 32, 3]
        params = init_mlp(jax.random.PRNGKey(0), dims, relu_final=False, use_gn=True)
        x = rng.normal(size=(17, 12)).astype(np.float32)
        out = apply_mlp(params, jnp.asarray(x), relu_final=False, use_gn=True)

        layers = []
        for i in range(len(dims) - 1):
            lin = torch.nn.Linear(dims[i], dims[i + 1])
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(np.asarray(params.weights[i]).T))
                lin.bias.copy_(torch.from_numpy(np.asarray(params.biases[i])))
            layers.append(lin)
            if i < len(dims) - 2:
                gn = torch.nn.GroupNorm(4, dims[i + 1])
                with torch.no_grad():
                    gn.weight.copy_(torch.from_numpy(np.asarray(params.gn_scales[i])))
                    gn.bias.copy_(torch.from_numpy(np.asarray(params.gn_biases[i])))
                layers.append(gn)
                layers.append(torch.nn.ReLU())
        net = torch.nn.Sequential(*layers)
        expect = net(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def _simple_cam():
    focal = jnp.asarray([100.0, 100.0])
    princpt = jnp.asarray([32.0, 32.0])
    return focal, princpt


class TestMeshRaster:
    def test_single_triangle_coverage(self):
        focal, princpt = _simple_cam()
        # triangle at z=2 projecting around image center
        verts = jnp.asarray(
            [[-0.3, -0.3, 2.0], [0.3, -0.3, 2.0], [0.0, 0.4, 2.0]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        frags = rasterize_mesh(verts, faces, focal, princpt, (64, 64))
        hit = np.asarray(frags.pix_to_face) >= 0
        assert hit.sum() > 100
        # centroid pixel must be covered with bary ~ each in (0,1), z = 2
        cx, cy = 32, int(32 + 100 * (-0.3 + -0.3 + 0.4) / 3 / 2)
        assert hit[cy, cx]
        np.testing.assert_allclose(float(frags.zbuf[cy, cx]), 2.0, atol=1e-3)
        b = np.asarray(frags.bary[cy, cx])
        np.testing.assert_allclose(b.sum(), 1.0, atol=1e-5)
        assert (b > 0).all()
        # background has face -1 and inf depth
        assert frags.pix_to_face[0, 0] == -1
        assert np.isinf(float(frags.zbuf[0, 0]))

    def test_zbuffer_order(self):
        focal, princpt = _simple_cam()
        # two stacked triangles; nearer one (z=1) must win where they overlap
        verts = jnp.asarray(
            [
                [-0.3, -0.3, 2.0], [0.3, -0.3, 2.0], [0.0, 0.4, 2.0],
                [-0.15, -0.15, 1.0], [0.15, -0.15, 1.0], [0.0, 0.2, 1.0],
            ],
            jnp.float32,
        )
        faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
        frags = rasterize_mesh(verts, faces, focal, princpt, (64, 64))
        assert int(frags.pix_to_face[33, 32]) == 1
        np.testing.assert_allclose(float(frags.zbuf[33, 32]), 1.0, atol=1e-3)

    def test_texture_render_and_grad(self, rng):
        focal, princpt = _simple_cam()
        verts = jnp.asarray(
            [[-0.3, -0.3, 2.0], [0.3, -0.3, 2.0], [0.0, 0.4, 2.0]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        uvmap = jnp.asarray(rng.uniform(0, 1, (3, 16, 16)).astype(np.float32))
        vertex_uv = jnp.asarray([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]], jnp.float32)

        def render(v):
            return render_textured_mesh(
                uvmap, v, faces, jnp.eye(3), jnp.zeros(3), focal, princpt,
                (64, 64), faces, vertex_uv,
            )

        img = render(verts)
        assert img.shape == (3, 64, 64)
        # background is exactly -1; foreground within [0,1]
        assert float(img[0, 0, 0]) == -1.0
        fg = np.asarray(img)[:, np.asarray(img[0]) != -1.0]
        assert fg.min() >= 0.0 and fg.max() <= 1.0
        # gradient flows to vertices through barycentrics + uv sample
        g = jax.grad(lambda v: jnp.sum(jnp.where(render(v) > -1, render(v), 0.0)))(verts)
        assert np.isfinite(np.asarray(g)).all()
        assert np.any(np.asarray(g) != 0)

    def test_perspective_correct_depth(self):
        focal, princpt = _simple_cam()
        # slanted triangle: depth at centroid must be perspective-correct
        verts = jnp.asarray(
            [[-0.6, -0.6, 1.5], [0.9, -0.9, 3.0], [0.0, 0.8, 2.0]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        frags = rasterize_mesh(verts, faces, focal, princpt, (64, 64))
        ij = np.argwhere(np.asarray(frags.pix_to_face) >= 0)
        i, j = ij[len(ij) // 2]
        b = np.asarray(frags.bary[i, j])
        # perspective-correct: interpolated position projects back to pixel
        p3d = b @ np.asarray(verts)
        px = p3d[0] / p3d[2] * 100 + 32
        py = p3d[1] / p3d[2] * 100 + 32
        np.testing.assert_allclose([px, py], [j + 0.5, i + 0.5], atol=0.02)
        np.testing.assert_allclose(float(frags.zbuf[i, j]), p3d[2], rtol=1e-4)
