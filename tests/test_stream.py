"""Instance-stream rasterizer conformance: stream backend (interpret mode)
vs the jnp tiled path — image, final_T, and full parameter gradients."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.binning import bin_instances_stream
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      _rasterize_stream,
                                                      rasterize)
from mvs_gaussian_splatting_tpu.utils import graphics

W, H = 64, 48
TILES_X, TILES_Y = W // 16, H // 16


def make_inputs(n=100, seed=0):
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraView(jnp.eye(4), jnp.asarray(P), jnp.zeros(3),
                     jnp.float32(math.tan(fovx / 2)),
                     jnp.float32(math.tan(fovy / 2)))
    rng = np.random.RandomState(seed)
    z = rng.uniform(2, 6, n)
    means = np.stack([rng.uniform(-0.8, 0.8, n) * z,
                      rng.uniform(-0.6, 0.6, n) * z, z], -1).astype(np.float32)
    return cam, (jnp.asarray(means),
                 jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)),
                 jnp.asarray(rng.randn(n, 4).astype(np.float32)),
                 jnp.asarray(rng.uniform(0.3, 0.97, n).astype(np.float32)),
                 jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)))


def render(cam, args, backend, bg):
    means, scales, quats, opac, colors = args
    p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                   colors_precomp=colors)
    if backend == "stream":
        return _rasterize_stream(p, W, H, bg,
                                 RasterConfig(instance_cap=1 << 14),
                                 TILES_X, TILES_Y, interpret=True)
    return rasterize(p, W, H, bg, RasterConfig(tile_capacity=256,
                                               backend="jnp"))


class TestStreamBinning:
    def test_counts_match_padded_binning(self):
        cam, args = make_inputs()
        means, scales, quats, opac, colors = args
        p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                       colors_precomp=colors)
        from mvs_gaussian_splatting_tpu.ops.binning import bin_gaussians
        bins_old = bin_gaussians(p, TILES_X, TILES_Y, 64, 512)
        bins_new = bin_instances_stream(p, TILES_X, TILES_Y, 64, 1 << 14)
        np.testing.assert_array_equal(np.asarray(bins_new.counts_raw),
                                      np.asarray(bins_old.counts))

    def test_segments_depth_sorted(self):
        cam, args = make_inputs()
        means, scales, quats, opac, colors = args
        p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                       colors_precomp=colors)
        bins = bin_instances_stream(p, TILES_X, TILES_Y, 64, 1 << 14)
        ss = np.asarray(bins.seg_start)
        depth = np.asarray(p.depth)
        ig = np.asarray(bins.order)[np.asarray(bins.inst_rank)]
        valid = np.asarray(bins.inst_valid)
        counts = np.asarray(bins.counts)
        # segments tile the valid prefix contiguously
        np.testing.assert_array_equal(ss[1:], ss[:-1] + counts[:-1])
        assert valid.sum() == counts.sum()
        for t in range(TILES_X * TILES_Y):
            seg = ig[ss[t]:ss[t] + counts[t]]
            assert valid[ss[t]:ss[t] + counts[t]].all()
            d = depth[seg]
            assert (np.diff(d) >= 0).all(), f"tile {t} not depth sorted"

    def test_overflow_counted(self):
        cam, args = make_inputs(n=200)
        means, scales, quats, opac, colors = args
        p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                       colors_precomp=colors)
        bins = bin_instances_stream(p, TILES_X, TILES_Y, 64, 256)  # tiny cap
        assert int(bins.overflow_capacity) > 0

    def _big_scene(self, n=1000):
        """Scene where >512 Gaussians have rect area above the tier-1 budget
        (big world scales), defeating the min(N,512) prefix floor."""
        import math as _m
        from mvs_gaussian_splatting_tpu.utils import graphics as _g
        fovx = _m.radians(60.0)
        fovy = _g.focal2fov(_g.fov2focal(fovx, W), H)
        P = _g.projection_matrix(0.01, 100.0, fovx, fovy)
        cam = CameraView(jnp.eye(4), jnp.asarray(P), jnp.zeros(3),
                         jnp.float32(_m.tan(fovx / 2)),
                         jnp.float32(_m.tan(fovy / 2)))
        rng = np.random.RandomState(7)
        z = rng.uniform(2, 6, n)
        means = np.stack([rng.uniform(-0.5, 0.5, n) * z,
                          rng.uniform(-0.4, 0.4, n) * z, z],
                         -1).astype(np.float32)
        scales = rng.uniform(0.5, 1.5, (n, 3)).astype(np.float32)  # huge
        return preprocess(jnp.asarray(means),
                          jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32)),
                          cam, W, H, scales=jnp.asarray(scales),
                          rotations=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
                          colors_precomp=jnp.asarray(
                              rng.rand(n, 3).astype(np.float32)))

    def test_tier_prefixes_cover_exactly(self):
        # fracs of 1.0 make every tier prefix cover all Gaussians: the tiered
        # enumeration must emit exactly the flat-budget instance set.
        p = self._big_scene()
        flat = bin_instances_stream(p, TILES_X, TILES_Y, 32, 1 << 16,
                                    tier_budgets=())
        tiered = bin_instances_stream(p, TILES_X, TILES_Y, 32, 1 << 16,
                                      tier_budgets=(4, 12),
                                      tier_fracs=(1.0, 1.0))
        np.testing.assert_array_equal(np.asarray(tiered.counts_raw),
                                      np.asarray(flat.counts_raw))
        np.testing.assert_array_equal(np.asarray(tiered.inst_rank),
                                      np.asarray(flat.inst_rank))
        assert int(tiered.overflow_tiles) == int(flat.overflow_tiles)

    def test_capacity_overflow_seg_start_clamped(self):
        # Tiles whose segments are truncated away must not carry offsets
        # past the buffer: the stream kernels derive 128-aligned DMA windows
        # from seg_start, so an unclamped start would read/write OOB HBM.
        p = self._big_scene()
        cap = 512
        bins = bin_instances_stream(p, TILES_X, TILES_Y, 32, cap)
        assert int(bins.overflow_capacity) > 0
        assert int(bins.seg_start.max()) <= cap
        ends = np.asarray(bins.seg_start) + np.asarray(bins.counts)
        assert ends.max() <= cap

    def test_increasing_tier_fracs_rejected(self):
        p = self._big_scene(64)
        with pytest.raises(ValueError, match="non-increasing"):
            bin_instances_stream(p, TILES_X, TILES_Y, 32, 1 << 14,
                                 tier_budgets=(4, 12),
                                 tier_fracs=(0.1, 0.25))

    def test_tier_shortfall_counted(self):
        # More big Gaussians than the tier prefix admits: instances are
        # dropped AND the drop is visible in overflow_tiles.
        p = self._big_scene()
        flat = bin_instances_stream(p, TILES_X, TILES_Y, 32, 1 << 16,
                                    tier_budgets=())
        tiered = bin_instances_stream(p, TILES_X, TILES_Y, 32, 1 << 16,
                                      tier_budgets=(4, 12),
                                      tier_fracs=(0.01, 0.01))
        assert int(tiered.counts_raw.sum()) < int(flat.counts_raw.sum())
        assert int(tiered.overflow_tiles) > int(flat.overflow_tiles)


class TestStreamComposite:
    def test_forward_parity(self):
        cam, args = make_inputs()
        bg = jnp.array([0.3, 0.1, 0.7])
        img_ref, aux_ref = render(cam, args, "jnp", bg)
        img_st, aux_st = render(cam, args, "stream", bg)
        assert int(aux_st["overflow_capacity"]) == 0
        np.testing.assert_allclose(np.asarray(img_st), np.asarray(img_ref),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(aux_st["final_T"]),
                                   np.asarray(aux_ref["final_T"]), atol=2e-5)

    def test_gradient_parity(self):
        cam, args = make_inputs(n=60, seed=3)
        bg = jnp.array([0.2, 0.5, 0.8])
        rng = np.random.RandomState(9)
        wimg = jnp.asarray(rng.rand(3, H, W).astype(np.float32))

        def loss(backend):
            def f(means, scales, quats, opac, colors):
                img, _ = render(cam, (means, scales, quats, opac, colors),
                                backend, bg)
                return (img * wimg).sum()
            return f

        g_ref = jax.grad(loss("jnp"), argnums=(0, 1, 2, 3, 4))(*args)
        g_st = jax.grad(loss("stream"), argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(("means", "scales", "quats", "opac", "colors"),
                              g_ref, g_st):
            scale = max(float(jnp.abs(a).max()), 1e-3)
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale,
                                       atol=2e-5, err_msg=name)

    def test_early_termination(self):
        cam, args = make_inputs(n=150, seed=5)
        means, scales, quats, opac, colors = args
        opac = jnp.minimum(opac * 3, 0.995)
        bg = jnp.zeros(3)
        img_ref, _ = render(cam, (means, scales, quats, opac, colors), "jnp", bg)
        img_st, aux = render(cam, (means, scales, quats, opac, colors),
                             "stream", bg)
        assert float(aux["final_T"].min()) < 1e-3
        np.testing.assert_allclose(np.asarray(img_st), np.asarray(img_ref),
                                   atol=2e-5, rtol=1e-4)
