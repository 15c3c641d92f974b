"""Golden-value tests for the pure math core against the reference semantics.

Golden values computed from the reference formulas (utils/graphics_utils.py,
utils/sh_utils.py, utils/general_utils.py, utils/loss_utils.py) with numpy —
no torch at test time.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.utils import graphics, losses, schedules, sh, sphere, transforms


class TestGraphics:
    def test_projection_matrix_golden(self):
        P = graphics.projection_matrix(0.01, 100.0, fovx=1.2, fovy=0.9)
        tan_x, tan_y = math.tan(0.6), math.tan(0.45)
        assert P[0, 0] == pytest.approx(1.0 / tan_x, rel=1e-6)
        assert P[1, 1] == pytest.approx(1.0 / tan_y, rel=1e-6)
        assert P[3, 2] == 1.0
        assert P[2, 2] == pytest.approx(100.0 / (100.0 - 0.01), rel=1e-6)
        assert P[2, 3] == pytest.approx(-(100.0 * 0.01) / (100.0 - 0.01), rel=1e-6)

    def test_world_to_view_roundtrip(self):
        rng = np.random.RandomState(0)
        q = rng.randn(4); q /= np.linalg.norm(q)
        R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q[None]))[0])
        # reference convention: R argument is C2W rotation (transposed W2C)
        t = rng.randn(3)
        W2V = graphics.world_to_view(R, t)
        # point at camera center maps to origin
        C2W = np.linalg.inv(W2V)
        center = C2W[:3, 3]
        out = W2V[:3, :3] @ center + W2V[:3, 3]
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_fov_focal_roundtrip(self):
        fov = 0.87
        assert graphics.focal2fov(graphics.fov2focal(fov, 640), 640) == pytest.approx(fov)

    def test_ndc2pix(self):
        # ndc2pix(v, S) = ((v+1)*S - 1)/2: -1 → -0.5, +1 → S-0.5
        assert graphics.ndc2pix(-1.0, 100) == -0.5
        assert graphics.ndc2pix(1.0, 100) == 99.5

    def test_nerfpp_norm(self):
        centers = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [2, 2, 0]], float)
        norm = graphics.nerfpp_norm(centers)
        np.testing.assert_allclose(norm["translate"], [-1, -1, 0])
        assert norm["radius"] == pytest.approx(1.1 * math.sqrt(2))


class TestSH:
    def test_deg0_constant(self):
        shs = jnp.ones((5, 1, 3)) * 2.0
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
        out = sh.eval_sh(0, shs, dirs)
        np.testing.assert_allclose(out, 2.0 * sh.C0, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(sh.sh2rgb(sh.rgb2sh(rgb)), rgb, rtol=1e-6)

    def test_deg1_golden(self):
        # reference eval_sh: result = C0*sh0 - C1*y*sh1 + C1*z*sh2 - C1*x*sh3
        rng = np.random.RandomState(1)
        coeffs = rng.randn(4, 3).astype(np.float32)
        d = rng.randn(3); d /= np.linalg.norm(d)
        expected = (sh.C0 * coeffs[0] - sh.C1 * d[1] * coeffs[1]
                    + sh.C1 * d[2] * coeffs[2] - sh.C1 * d[0] * coeffs[3])
        out = sh.eval_sh(1, jnp.asarray(coeffs)[None], jnp.asarray(d)[None])
        np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-5)

    def test_deg4_shape_and_finite(self):
        rng = np.random.RandomState(2)
        coeffs = jnp.asarray(rng.randn(7, 25, 3).astype(np.float32))
        d = rng.randn(7, 3); d /= np.linalg.norm(d, axis=1, keepdims=True)
        out = sh.eval_sh(4, coeffs, jnp.asarray(d.astype(np.float32)))
        assert out.shape == (7, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_clamped_path(self):
        shs = jnp.full((1, 1, 3), -10.0)
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        rgb, clamped = sh.sh_to_rgb_clamped(0, shs, dirs)
        assert (np.asarray(rgb) == 0).all()
        assert np.asarray(clamped).all()


class TestTransforms:
    def test_quat_identity(self):
        R = transforms.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)

    def test_quat_orthonormal(self):
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(10, 4).astype(np.float32))
        R = np.asarray(transforms.quat_to_rotmat(q))
        for i in range(10):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R[i]) == pytest.approx(1.0, abs=1e-5)

    def test_quat_90deg_z(self):
        # 90° about z: w = cos(45°), z = sin(45°)
        c = math.cos(math.pi / 4)
        R = np.asarray(transforms.quat_to_rotmat(jnp.array([[c, 0, 0, c]]))[0])
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_covariance_psd_and_strip_roundtrip(self):
        rng = np.random.RandomState(4)
        s = jnp.asarray(np.abs(rng.randn(6, 3)).astype(np.float32) + 0.1)
        q = jnp.asarray(rng.randn(6, 4).astype(np.float32))
        cov = transforms.covariance_from_scaling_rotation(s, q)
        eigs = np.linalg.eigvalsh(np.asarray(cov))
        assert (eigs > 0).all()
        c6 = transforms.strip_symmetric(cov)
        back = transforms.unstrip_symmetric(c6)
        np.testing.assert_allclose(np.asarray(back), np.asarray(cov), rtol=1e-6)

    def test_covariance_axis_aligned(self):
        s = jnp.array([[2.0, 3.0, 4.0]])
        q = jnp.array([[1.0, 0, 0, 0]])
        cov = np.asarray(transforms.covariance_from_scaling_rotation(s, q)[0])
        np.testing.assert_allclose(cov, np.diag([4.0, 9.0, 16.0]), atol=1e-5)

    def test_inverse_sigmoid(self):
        x = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(transforms.inverse_sigmoid(x))), x, rtol=1e-5)


class TestLosses:
    def test_l1(self):
        a, b = jnp.zeros((3, 4, 4)), jnp.ones((3, 4, 4)) * 0.5
        assert float(losses.l1_loss(a, b)) == pytest.approx(0.5)

    def test_psnr_identical(self):
        img = jnp.ones((3, 8, 8)) * 0.3
        assert float(losses.psnr(img, img)[0]) > 80

    def test_psnr_golden(self):
        a = jnp.zeros((3, 10, 10))
        b = jnp.full((3, 10, 10), 0.1)
        assert float(losses.psnr(a, b)[0]) == pytest.approx(20.0, rel=1e-4)

    def test_ssim_identical_is_one(self):
        rng = np.random.RandomState(5)
        img = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_different_below_one(self):
        rng = np.random.RandomState(6)
        a = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
        b = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
        assert float(losses.ssim(a, b)) < 0.5

    def test_ssim_window_normalized(self):
        w = losses._gaussian_window(11, 1.5)
        assert w.sum() == pytest.approx(1.0, rel=1e-6)
        assert w.shape == (11, 11)
        # peak at center
        assert w[5, 5] == w.max()


class TestSchedules:
    def test_endpoints(self):
        lr0 = float(schedules.expon_lr(0, 1e-2, 1e-4, max_steps=100))
        lr_end = float(schedules.expon_lr(100, 1e-2, 1e-4, max_steps=100))
        assert lr0 == pytest.approx(1e-2, rel=1e-5)
        assert lr_end == pytest.approx(1e-4, rel=1e-5)

    def test_log_linear_midpoint(self):
        mid = float(schedules.expon_lr(50, 1e-2, 1e-4, max_steps=100))
        assert mid == pytest.approx(1e-3, rel=1e-4)

    def test_negative_step_zero(self):
        assert float(schedules.expon_lr(-5, 1e-2, 1e-4)) == 0.0

    def test_delay_ramp(self):
        # at step 0 with delay: lr_init * delay_mult
        lr = float(schedules.expon_lr(0, 1e-2, 1e-4, lr_delay_steps=10,
                                      lr_delay_mult=0.01, max_steps=100))
        assert lr == pytest.approx(1e-4, rel=1e-4)

    def test_traceable(self):
        f = jax.jit(lambda s: schedules.expon_lr(s, 1e-2, 1e-4, max_steps=100))
        assert float(f(50)) == pytest.approx(1e-3, rel=1e-4)


class TestSphere:
    def test_unit_norm_and_count(self):
        pts = sphere.sphere_points(128)
        assert pts.shape == (128, 3)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)

    def test_z_range(self):
        pts = sphere.sphere_points(64)
        assert pts[0, 2] == pytest.approx(1 - 1 / 64)
        assert pts[-1, 2] == pytest.approx(1 / 64 - 1)
