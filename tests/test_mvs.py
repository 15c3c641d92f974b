"""MVS cost-volume branch: warp geometry and end-to-end model smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.mvs import MVSGaussianModel, build_cost_volume
from mvs_gaussian_splatting_tpu.mvs.homography import (bilinear_sample,
                                                       plane_sweep_warp)


class TestBilinear:
    def test_exact_at_centers(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
        v = bilinear_sample(img, jnp.array([2.0]), jnp.array([1.0]))
        assert float(v[0, 0]) == 6.0

    def test_interpolates(self):
        img = jnp.asarray(np.array([[[0.0, 2.0]]], np.float32))  # [1,1,2]
        v = bilinear_sample(img, jnp.array([0.5]), jnp.array([0.0]))
        assert float(v[0, 0]) == pytest.approx(1.0)

    def test_outside_zero(self):
        img = jnp.ones((1, 4, 4))
        v = bilinear_sample(img, jnp.array([-5.0]), jnp.array([0.0]))
        assert float(v[0, 0]) == 0.0


class TestPlaneSweep:
    def test_identity_pose_identity_warp(self):
        """Warping a view into itself at any depth is the identity."""
        rng = np.random.RandomState(0)
        feat = jnp.asarray(rng.rand(4, 16, 16).astype(np.float32))
        K = jnp.asarray(np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]],
                                 np.float32))
        warped = plane_sweep_warp(feat, jnp.linalg.inv(K), K, jnp.eye(3),
                                  jnp.zeros(3), jnp.array([1.0, 3.0]), 16, 16)
        for d in range(2):
            np.testing.assert_allclose(np.asarray(warped[d]), np.asarray(feat),
                                       atol=1e-4)

    def test_cost_volume_zero_for_identical_views(self):
        rng = np.random.RandomState(1)
        feat = jnp.asarray(rng.rand(4, 8, 8).astype(np.float32))
        K = jnp.asarray(np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]],
                                 np.float32))
        vol = build_cost_volume(
            feat, feat[None], jnp.linalg.inv(K), K[None], jnp.eye(3)[None],
            jnp.zeros((1, 3)), jnp.array([2.0]), 8, 8)
        # identical view warped onto itself → variance ~0
        assert float(jnp.abs(vol).max()) < 1e-6


class TestMVSModel:
    def test_forward_and_grads(self):
        rng = np.random.RandomState(2)
        H = W = 32
        ref = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
        srcs = jnp.asarray(rng.rand(2, 3, H, W).astype(np.float32))
        hf, wf = H // 4, W // 4
        K = jnp.asarray(np.array([[wf, 0, wf / 2], [0, wf, hf / 2], [0, 0, 1]],
                                 np.float32))
        model = MVSGaussianModel(num_depths=8)
        variables = model.init(jax.random.PRNGKey(0), ref, srcs, K,
                               jnp.stack([K, K]),
                               jnp.stack([jnp.eye(3)] * 2),
                               jnp.zeros((2, 3)), 1.0, 5.0)
        out = model.apply(variables, ref, srcs, K, jnp.stack([K, K]),
                          jnp.stack([jnp.eye(3)] * 2), jnp.zeros((2, 3)),
                          1.0, 5.0)
        n = hf * wf
        assert out["xyz_cam"].shape == (n, 3)
        assert out["rotation"].shape == (n, 4)
        assert out["depth"].shape == (hf, wf)
        assert np.isfinite(np.asarray(out["xyz_cam"])).all()
        d = np.asarray(out["depth"])
        assert (d >= 1.0).all() and (d <= 5.0).all()

        def loss(vs):
            o = model.apply(vs, ref, srcs, K, jnp.stack([K, K]),
                            jnp.stack([jnp.eye(3)] * 2), jnp.zeros((2, 3)),
                            1.0, 5.0)
            return (o["depth"] ** 2).mean() + (o["colors"] ** 2).mean()

        g = jax.grad(loss)(variables)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


class TestMVSEndToEnd:
    def test_predicted_gaussians_render_and_train(self):
        """The full generalizable pipeline: images → cost volume → Gaussian
        cloud → tiled rasterizer → photometric loss → gradients into the
        network weights."""
        import math
        from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
        from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                              rasterize)
        from mvs_gaussian_splatting_tpu.utils import graphics
        from mvs_gaussian_splatting_tpu.utils.transforms import normalize

        rng = np.random.RandomState(5)
        H = W = 32
        ref = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
        srcs = jnp.asarray(rng.rand(2, 3, H, W).astype(np.float32))
        hf, wf = H // 4, W // 4
        K = jnp.asarray(np.array([[wf, 0, wf / 2], [0, wf, hf / 2], [0, 0, 1]],
                                 np.float32))
        model = MVSGaussianModel(num_depths=8)
        variables = model.init(jax.random.PRNGKey(0), ref, srcs, K,
                               jnp.stack([K, K]), jnp.stack([jnp.eye(3)] * 2),
                               jnp.zeros((2, 3)), 1.0, 5.0)

        # render camera: identity pose (reference camera frame == world)
        fovx = 2 * math.atan(W / (2 * wf * 4))  # consistent-ish fov
        fovy = fovx
        P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
        cam = CameraView(jnp.eye(4), jnp.asarray(P), jnp.zeros(3),
                         jnp.float32(math.tan(fovx / 2)),
                         jnp.float32(math.tan(fovy / 2)))
        cfg = RasterConfig(tile_capacity=64, max_tiles_per_gaussian=8,
                           tile_batch=4, backend="jnp")

        def loss_fn(vs):
            out = model.apply(vs, ref, srcs, K, jnp.stack([K, K]),
                              jnp.stack([jnp.eye(3)] * 2), jnp.zeros((2, 3)),
                              1.0, 5.0)
            p = preprocess(out["xyz_cam"],
                           jax.nn.sigmoid(out["opacity_logit"][:, 0]),
                           cam, W, H,
                           scales=jnp.exp(out["log_scaling"]),
                           rotations=normalize(out["rotation"]),
                           colors_precomp=out["colors"])
            img, _ = rasterize(p, W, H, jnp.zeros(3), cfg)
            return ((img - ref) ** 2).mean(), img

        (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(img)).all()
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
