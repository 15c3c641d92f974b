"""Rasterizer conformance tests: preprocess semantics, oracle vs tiled path,
and gradient parity (the project's 'pixel-grad allclose' north star at
mini scale)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.ops import (CameraView, preprocess,
                                            rasterize, rasterize_reference)
from mvs_gaussian_splatting_tpu.ops.binning import bin_gaussians
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.utils import graphics


W, H = 64, 48
FOV = math.radians(60.0)


def make_camera(w=W, h=H):
    fovx = FOV
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, w), h)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    view = np.eye(4, dtype=np.float32)
    return CameraView(
        viewmatrix=jnp.asarray(view),
        projmatrix=jnp.asarray(P @ view),
        campos=jnp.zeros(3),
        tanfovx=jnp.float32(math.tan(fovx / 2)),
        tanfovy=jnp.float32(math.tan(fovy / 2)),
    ), fovx, fovy


def make_scene(n=80, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.uniform(2.0, 6.0, n)
    x = rng.uniform(-0.8, 0.8, n) * z
    y = rng.uniform(-0.6, 0.6, n) * z
    means = np.stack([x, y, z], -1).astype(np.float32)
    scales = rng.uniform(0.05, 0.25, (n, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))


class TestPreprocess:
    def test_center_projection_and_depth(self):
        cam, _, _ = make_camera()
        means = jnp.array([[0.0, 0.0, 4.0]])
        p = preprocess(means, jnp.array([0.8]), cam, W, H,
                       scales=jnp.array([[0.1, 0.1, 0.1]]),
                       rotations=jnp.array([[1.0, 0, 0, 0]]),
                       colors_precomp=jnp.ones((1, 3)))
        assert float(p.depth[0]) == pytest.approx(4.0)
        # NDC (0,0) → pixel ((S-1)/2)
        assert float(p.xy[0, 0]) == pytest.approx((W - 1) / 2, abs=1e-3)
        assert float(p.xy[0, 1]) == pytest.approx((H - 1) / 2, abs=1e-3)
        assert bool(p.mask[0])
        assert int(p.radius[0]) > 0

    def test_behind_camera_culled(self):
        cam, _, _ = make_camera()
        means = jnp.array([[0.0, 0.0, -3.0], [0.0, 0.0, 0.1]])
        p = preprocess(means, jnp.array([0.8, 0.8]), cam, W, H,
                       scales=jnp.full((2, 3), 0.1),
                       rotations=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
                       colors_precomp=jnp.ones((2, 3)))
        assert not bool(p.mask[0]) and not bool(p.mask[1])
        assert int(p.radius[0]) == 0 and int(p.radius[1]) == 0

    def test_isotropic_conic(self):
        # Isotropic splat on the optical axis: cov2d = (f·s/z)²·I + 0.3·I.
        cam, fovx, fovy = make_camera()
        s, z = 0.2, 4.0
        p = preprocess(jnp.array([[0.0, 0.0, z]]), jnp.array([0.9]), cam, W, H,
                       scales=jnp.full((1, 3), s),
                       rotations=jnp.array([[1.0, 0, 0, 0]]),
                       colors_precomp=jnp.ones((1, 3)))
        focal = W / (2 * math.tan(fovx / 2))
        expected_var = (focal * s / z) ** 2 + 0.3
        np.testing.assert_allclose(float(p.conic[0, 0]), 1 / expected_var, rtol=1e-4)
        np.testing.assert_allclose(float(p.conic[0, 2]), 1 / expected_var, rtol=1e-4)
        assert float(p.conic[0, 1]) == pytest.approx(0.0, abs=1e-6)
        # radius = ceil(3·sqrt(max eigenvalue))
        assert int(p.radius[0]) == math.ceil(3 * math.sqrt(expected_var))

    def test_alive_mask_respected(self):
        cam, _, _ = make_camera()
        means, scales, quats, opac, colors = make_scene(10)
        alive = jnp.array([True] * 5 + [False] * 5)
        p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                       colors_precomp=colors, mask=alive)
        assert not np.asarray(p.mask[5:]).any()
        assert (np.asarray(p.radius[5:]) == 0).all()


class TestBinning:
    def test_counts_match_bruteforce(self):
        cam, _, _ = make_camera()
        means, scales, quats, opac, colors = make_scene(60)
        p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                       colors_precomp=colors)
        tiles_x, tiles_y = W // 16, H // 16
        bins = bin_gaussians(p, tiles_x, tiles_y, 64, 256)
        rect_min = np.asarray(p.rect_min)
        rect_max = np.asarray(p.rect_max)
        mask = np.asarray(p.mask)
        xy = np.asarray(p.xy)
        cull_r2 = np.asarray(p.cull_r2)
        for t in range(tiles_x * tiles_y):
            tx, ty = t % tiles_x, t // tiles_x
            # rect membership ∩ level-set disc test (binning's exact cull)
            dx = np.maximum(np.maximum(tx * 16 - xy[:, 0],
                                       xy[:, 0] - (tx * 16 + 15)), 0)
            dy = np.maximum(np.maximum(ty * 16 - xy[:, 1],
                                       xy[:, 1] - (ty * 16 + 15)), 0)
            in_disc = dx * dx + dy * dy <= cull_r2
            expected = int(np.sum(mask & in_disc
                                  & (rect_min[:, 0] <= tx) & (tx < rect_max[:, 0])
                                  & (rect_min[:, 1] <= ty) & (ty < rect_max[:, 1])))
            assert int(bins.counts[t]) == expected

    def test_depth_sorted_within_tile(self):
        cam, _, _ = make_camera()
        means, scales, quats, opac, colors = make_scene(60)
        p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                       colors_precomp=colors)
        tiles_x, tiles_y = W // 16, H // 16
        bins = bin_gaussians(p, tiles_x, tiles_y, 64, 256)
        depth = np.asarray(p.depth)
        idx = np.asarray(bins.gauss_idx)
        valid = np.asarray(bins.valid)
        for t in range(tiles_x * tiles_y):
            d = depth[idx[t][valid[t]]]
            assert (np.diff(d) >= 0).all()

    def test_no_overflow_with_big_budget(self):
        cam, _, _ = make_camera()
        means, scales, quats, opac, colors = make_scene(60)
        p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                       colors_precomp=colors)
        bins = bin_gaussians(p, W // 16, H // 16, 64, 512)
        assert int(bins.overflow_tiles) == 0
        assert int(bins.overflow_capacity) == 0


def _render_both(n=80, seed=0, bg=None):
    cam, _, _ = make_camera()
    means, scales, quats, opac, colors = make_scene(n, seed)
    bg = jnp.zeros(3) if bg is None else bg
    p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                   colors_precomp=colors)
    ref = rasterize_reference(p, W, H, bg)
    cfg = RasterConfig(tile_capacity=128, tile_batch=4, backend="jnp")
    tiled, aux = rasterize(p, W, H, bg, cfg)
    return ref, tiled, aux


class TestTiledVsReference:
    def test_image_parity(self):
        ref, tiled, aux = _render_both()
        assert int(aux["overflow_capacity"]) == 0
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_image_parity_white_bg(self):
        ref, tiled, _ = _render_both(bg=jnp.ones(3))
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_nonuniform_size(self):
        # width/height not multiples of the tile: 50×35
        w2, h2 = 50, 35
        cam, _, _ = make_camera(w2, h2)
        means, scales, quats, opac, colors = make_scene(40, 3)
        bg = jnp.zeros(3)
        p = preprocess(means, opac, cam, w2, h2, scales=scales, rotations=quats,
                       colors_precomp=colors)
        ref = rasterize_reference(p, w2, h2, bg)
        tiled, _ = rasterize(p, w2, h2, bg,
                             RasterConfig(tile_capacity=128, backend="jnp"))
        assert tiled.shape == (3, h2, w2)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_single_gaussian_analytic(self):
        # One isotropic splat at a pixel center: I = c·α + bg·(1−α), α=opacity.
        cam, _, _ = make_camera()
        z = 4.0
        # place so that projected center falls exactly on pixel (31, 23): NDC
        # of pixel p is (2p+1)/S - 1
        ndc_x = (2 * 31 + 1) / W - 1
        ndc_y = (2 * 23 + 1) / H - 1
        # invert projection: ndc = (P@[x,y,z,1]) xy/w; for this P, w = z,
        # ndc_x = x/(z·tanx) → x = ndc_x·z·tanx
        tanx = math.tan(FOV / 2)
        fovy = graphics.focal2fov(graphics.fov2focal(FOV, W), H)
        tany = math.tan(fovy / 2)
        means = jnp.array([[ndc_x * z * tanx, ndc_y * z * tany, z]])
        op = 0.7
        p = preprocess(means, jnp.array([op]), cam, W, H,
                       scales=jnp.full((1, 3), 0.3),
                       rotations=jnp.array([[1.0, 0, 0, 0]]),
                       colors_precomp=jnp.array([[0.2, 0.5, 0.9]]))
        bg = jnp.array([1.0, 1.0, 1.0])
        img, _ = rasterize(p, W, H, bg, RasterConfig(backend="jnp"))
        expected = np.array([0.2, 0.5, 0.9]) * op + 1.0 * (1 - op)
        np.testing.assert_allclose(np.asarray(img[:, 23, 31]), expected, atol=1e-4)


class TestGradients:
    def _loss_fns(self):
        cam, _, _ = make_camera()
        means, scales, quats, opac, colors = make_scene(40, 7)
        bg = jnp.zeros(3)
        rngw = np.random.RandomState(11)
        wimg = jnp.asarray(rngw.rand(3, H, W).astype(np.float32))

        def loss_ref(m, s, q, o, c):
            p = preprocess(m, o, cam, W, H, scales=s, rotations=q,
                           colors_precomp=c)
            return (rasterize_reference(p, W, H, bg) * wimg).sum()

        def loss_tiled(m, s, q, o, c):
            p = preprocess(m, o, cam, W, H, scales=s, rotations=q,
                           colors_precomp=c)
            img, _ = rasterize(p, W, H, bg,
                               RasterConfig(tile_capacity=128, backend="jnp"))
            return (img * wimg).sum()

        args = (means, scales, quats, opac, colors)
        return loss_ref, loss_tiled, args

    def test_grad_parity_ref_vs_tiled(self):
        loss_ref, loss_tiled, args = self._loss_fns()
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
        names = ["means", "scales", "quats", "opacity", "colors"]
        for name, a, b in zip(names, g_ref, g_tiled):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-3, rtol=5e-3, err_msg=name)

    def test_grads_finite_and_nonzero(self):
        _, loss_tiled, args = self._loss_fns()
        grads = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
        for g in grads:
            g = np.asarray(g)
            assert np.isfinite(g).all()
        assert np.abs(np.asarray(grads[0])).max() > 0

    def test_ndc_offset_grad(self):
        """The viewspace-gradient hook: grads w.r.t. the NDC offset are the
        densification statistic (reference screenspace_points.grad)."""
        cam, _, _ = make_camera()
        means, scales, quats, opac, colors = make_scene(30, 9)
        bg = jnp.zeros(3)

        def loss(off):
            p = preprocess(means, opac, cam, W, H, scales=scales,
                           rotations=quats, colors_precomp=colors,
                           ndc_offset=off)
            img, _ = rasterize(p, W, H, bg, RasterConfig(backend="jnp"))
            return (img ** 2).sum()

        g = jax.grad(loss)(jnp.zeros((30, 2)))
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert (np.abs(g).sum(axis=1) > 0).any()

    def test_sh_color_grad_path(self):
        cam, _, _ = make_camera()
        means, scales, quats, opac, _ = make_scene(20, 13)
        rng = np.random.RandomState(13)
        shs = jnp.asarray(rng.randn(20, 16, 3).astype(np.float32) * 0.3)
        bg = jnp.zeros(3)

        def loss(sh_coeffs):
            p = preprocess(means, opac, cam, W, H, scales=scales,
                           rotations=quats, shs=sh_coeffs, sh_degree=3)
            img, _ = rasterize(p, W, H, bg, RasterConfig(backend="jnp"))
            return img.sum()

        g = np.asarray(jax.grad(loss)(shs))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0
