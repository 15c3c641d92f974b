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


class TestTransforms:
    def test_rotmat_quat_roundtrip(self):
        from mvs_gaussian_splatting_tpu.utils.transforms import (
            quat_to_rotmat, rotmat_to_quat)
        rng = np.random.RandomState(3)
        for _ in range(8):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
            q2 = np.asarray(rotmat_to_quat(jnp.asarray(R)))
            # q and -q are the same rotation
            if np.dot(q, q2) < 0:
                q2 = -q2
            np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_quat_multiply_matches_matrix_product(self):
        from mvs_gaussian_splatting_tpu.utils.transforms import (
            quat_multiply, quat_to_rotmat)
        rng = np.random.RandomState(4)
        a = rng.randn(4); a /= np.linalg.norm(a)
        b = rng.randn(4); b /= np.linalg.norm(b)
        Rab = np.asarray(quat_to_rotmat(
            quat_multiply(jnp.asarray(a), jnp.asarray(b))))
        Ra = np.asarray(quat_to_rotmat(jnp.asarray(a)))
        Rb = np.asarray(quat_to_rotmat(jnp.asarray(b)))
        np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)

    def test_gaussians_to_world_renders_like_cam_frame(self):
        """Rendering world-frame Gaussians from the ref camera must equal
        rendering the cam-frame Gaussians from an identity camera."""
        import math
        from mvs_gaussian_splatting_tpu.mvs.dataset import make_synthetic_groups
        from mvs_gaussian_splatting_tpu.mvs.train import (gaussians_to_world,
                                                          group_to_batch)
        from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
        from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                              rasterize)
        from mvs_gaussian_splatting_tpu.utils import graphics
        from mvs_gaussian_splatting_tpu.utils.transforms import normalize

        rng = np.random.RandomState(7)
        n = 64
        out = {
            "xyz_cam": jnp.asarray(
                np.concatenate([rng.uniform(-1, 1, (n, 2)),
                                rng.uniform(2, 5, (n, 1))], 1).astype(np.float32)),
            "rotation": jnp.asarray(rng.randn(n, 4).astype(np.float32)),
            "log_scaling": jnp.asarray(
                np.log(rng.uniform(0.05, 0.2, (n, 3))).astype(np.float32)),
            "opacity_logit": jnp.asarray(rng.randn(n, 1).astype(np.float32)),
            "colors": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        }
        # an arbitrary ref pose
        groups = make_synthetic_groups(n_groups=1, width=48, height=32,
                                       n_gauss=8, seed=1)
        w2c = jnp.asarray(groups[0].ref.w2c)
        xyz_w, rot_w = gaussians_to_world(out, w2c)

        W, H = 48, 32
        fovx = math.radians(55.0)
        fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
        P = jnp.asarray(graphics.projection_matrix(0.01, 100.0, fovx, fovy))
        cfg = RasterConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                           tile_batch=8, backend="jnp")
        tf = (jnp.float32(math.tan(fovx / 2)), jnp.float32(math.tan(fovy / 2)))

        cam_world = CameraView(w2c, P @ w2c,
                               jnp.linalg.inv(w2c)[:3, 3], *tf)
        cam_ident = CameraView(jnp.eye(4), P, jnp.zeros(3), *tf)

        def rend(cam, xyz, rot):
            p = preprocess(xyz, jax.nn.sigmoid(out["opacity_logit"][:, 0]),
                           cam, W, H, scales=jnp.exp(out["log_scaling"]),
                           rotations=normalize(rot),
                           colors_precomp=out["colors"])
            return rasterize(p, W, H, jnp.zeros(3), cfg)[0]

        img_world = rend(cam_world, xyz_w, rot_w)
        img_cam = rend(cam_ident, out["xyz_cam"], out["rotation"])
        np.testing.assert_allclose(np.asarray(img_world),
                                   np.asarray(img_cam), atol=2e-4)


class TestDataset:
    CAM_TXT = """extrinsic
0.9702 0.0 0.2425 -0.1
0.0 1.0 0.0 0.05
-0.2425 0.0 0.9702 2.0
0.0 0.0 0.0 1.0

intrinsic
361.54 0.0 82.9
0.0 360.39 66.7
0.0 0.0 1.0

425.0 2.5 192 905.0
"""

    def test_parse_cam_txt(self):
        from mvs_gaussian_splatting_tpu.mvs.dataset import parse_cam_txt
        w2c, K, near, far = parse_cam_txt(self.CAM_TXT)
        assert w2c.shape == (4, 4) and K.shape == (3, 3)
        assert w2c[2, 3] == pytest.approx(2.0)
        assert K[0, 0] == pytest.approx(361.54)
        assert near == pytest.approx(425.0)
        assert far == pytest.approx(905.0)

    def test_parse_cam_txt_two_field_depth(self):
        from mvs_gaussian_splatting_tpu.mvs.dataset import parse_cam_txt
        txt = self.CAM_TXT.replace("425.0 2.5 192 905.0", "425.0 2.5")
        _, _, near, far = parse_cam_txt(txt)
        assert near == pytest.approx(425.0)
        assert far == pytest.approx(425.0 + 2.5 * 192)

    def test_parse_pair_txt(self):
        from mvs_gaussian_splatting_tpu.mvs.dataset import parse_pair_txt
        txt = """2
0
3 10 2346.41 1 2036.53 9 1243.89
1
2 9 2850.87 10 2583.94
"""
        pairs = parse_pair_txt(txt)
        assert pairs == {0: [10, 1, 9], 1: [9, 10]}

    def test_synthetic_groups_shapes_and_parallax(self):
        from mvs_gaussian_splatting_tpu.mvs.dataset import make_synthetic_groups
        gs = make_synthetic_groups(n_groups=2, width=48, height=32,
                                   n_gauss=100, seed=0)
        assert len(gs) == 2
        g = gs[0]
        assert g.ref.image.shape == (3, 32, 48)
        assert len(g.srcs) == 2
        # views must differ (real parallax) but overlap (same scene)
        d = np.abs(g.ref.image - g.srcs[0].image).mean()
        assert 1e-3 < d < 0.5
        assert g.ref.image.max() > 0.05


class TestMVSTraining:
    def test_train_synthetic_to_psnr(self):
        """The full trainable branch: synthetic 3-view groups -> cost volume
        -> Gaussians -> rasterizer -> photometric loss; a short run must
        lift held-out-view PSNR well above the initialization."""
        from mvs_gaussian_splatting_tpu.mvs.dataset import make_synthetic_groups
        from mvs_gaussian_splatting_tpu.mvs.train import MVSConfig, train_mvs

        groups = make_synthetic_groups(n_groups=4, width=64, height=48,
                                       n_gauss=200, seed=2)
        cfg = MVSConfig(iterations=150, lr=2e-3, num_depths=12,
                        eval_every=50, backend="jnp", seed=0,
                        feat_dims=(8, 16, 16))
        _, history = train_mvs(cfg, groups[1:], eval_groups=groups[:1],
                               log_fn=lambda s: None)
        evals = history["psnr_eval"]
        losses = dict(history["loss"])
        first_loss = losses[min(losses)]
        last_loss = losses[max(losses)]
        # strong, non-flaky learning signals: training loss cut ~in half
        # within 150 iters and held-out PSNR clearly above garbage
        # (measured: loss 0.19 → 0.107, eval PSNR 18.9 → 19.6)
        assert last_loss < 0.7 * first_loss, f"no learning: {losses}"
        assert evals[max(evals)] > 16.0, f"PSNR too low: {evals}"
        assert evals[max(evals)] >= evals[min(evals)], f"regressed: {evals}"

    def test_generalizes_to_held_out_scene(self):
        """The generalizable claim proper: train on several DISTINCT scenes,
        evaluate on groups of a scene never seen in training (not just a
        held-out view of a training scene)."""
        from mvs_gaussian_splatting_tpu.mvs.dataset import make_synthetic_scenes
        from mvs_gaussian_splatting_tpu.mvs.train import MVSConfig, train_mvs

        scenes = make_synthetic_scenes(n_scenes=4, groups_per_scene=2,
                                       width=64, height=48, n_gauss=200,
                                       seed=5)
        train_groups = [g for sc in scenes[1:] for g in sc]
        cfg = MVSConfig(iterations=200, lr=2e-3, num_depths=12,
                        eval_every=100, backend="jnp", seed=0,
                        feat_dims=(8, 16, 16))
        _, history = train_mvs(cfg, train_groups, eval_groups=scenes[0],
                               log_fn=lambda s: None)
        evals = history["psnr_eval"]
        # unseen-scene PSNR must be clearly above garbage and not collapse
        # (measured: 17.0 @100 -> 17.5 @200; garbage init renders ~8-11 dB)
        assert evals[max(evals)] > 15.0, f"held-out scene PSNR: {evals}"
        assert evals[max(evals)] >= evals[min(evals)] - 0.5, evals

    def test_depth_supervision_improves_depth(self):
        """lambda_depth pulls the cost-volume expected depth toward the
        fixture's rendered GT depth map on the reference view."""
        import jax
        import jax.numpy as jnp

        from mvs_gaussian_splatting_tpu.mvs.dataset import make_synthetic_groups
        from mvs_gaussian_splatting_tpu.mvs.train import (MVSConfig,
                                                          group_to_batch,
                                                          train_mvs)
        from mvs_gaussian_splatting_tpu.mvs.model import MVSGaussianModel

        groups = make_synthetic_groups(n_groups=3, width=64, height=48,
                                       n_gauss=200, seed=7)
        assert groups[0].ref.depth is not None
        assert (groups[0].ref.depth > 0).mean() > 0.3   # real coverage

        def depth_err(variables, cfg):
            model = MVSGaussianModel(num_depths=cfg.num_depths,
                                     feat_dims=cfg.feat_dims)
            b = group_to_batch(groups[0])
            out = model.apply(variables, b.ref_image, b.src_images,
                              b.k_ref_feat, b.k_src_feats, b.rel_rs,
                              b.rel_ts, b.near, b.far)
            gt = jax.image.resize(b.ref_depth, out["depth"].shape, "bilinear")
            m = gt > 0
            return float(jnp.abs(out["depth"] - gt)[m].mean())

        kw = dict(iterations=120, lr=2e-3, num_depths=12, eval_every=120,
                  backend="jnp", seed=0, feat_dims=(8, 16, 16))
        cfg_no = MVSConfig(lambda_depth=0.0, **kw)
        cfg_d = MVSConfig(lambda_depth=1.0, **kw)
        v_no, _ = train_mvs(cfg_no, groups, log_fn=lambda s: None)
        v_d, _ = train_mvs(cfg_d, groups, log_fn=lambda s: None)
        e_no, e_d = depth_err(v_no, cfg_no), depth_err(v_d, cfg_d)
        assert e_d < e_no, (e_no, e_d)
