"""Conformance tests: Pallas composite kernels (interpret mode) vs the jnp
tile compositor — forward image, final transmittance, and all input
gradients. This is the CPU-side check of the TPU kernels; bench.py exercises
the compiled path on hardware."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.binning import bin_gaussians
from mvs_gaussian_splatting_tpu.ops.pallas.composite import composite_tiles_pallas
from mvs_gaussian_splatting_tpu.ops.rasterize import composite_tiles_jnp
from mvs_gaussian_splatting_tpu.utils import graphics

W, H = 64, 48
TILES_X, TILES_Y = W // 16, H // 16
K = 128


def make_tile_inputs(n=80, seed=0, opacity_hi=0.99):
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
    p = preprocess(
        jnp.asarray(means),
        jnp.asarray(rng.uniform(0.3, opacity_hi, n).astype(np.float32)),
        cam, W, H,
        scales=jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)),
        rotations=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
        colors_precomp=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)))
    bins = bin_gaussians(p, TILES_X, TILES_Y, 64, K)
    idx = bins.gauss_idx
    return (p.xy[idx], p.conic[idx], p.rgb[idx], p.opacity[idx], bins.valid,
            jnp.arange(TILES_X * TILES_Y, dtype=jnp.int32))


@pytest.fixture(scope="module")
def inputs():
    return make_tile_inputs()


class TestPallasComposite:
    def test_forward_parity(self, inputs):
        xy, conic, rgb, op, valid, ids = inputs
        bg = jnp.array([0.3, 0.1, 0.7])
        ref_out, ref_T = composite_tiles_jnp(xy, conic, rgb, op, valid, ids,
                                             TILES_X, 16, 16, bg)
        pal_out, pal_T = composite_tiles_pallas(xy, conic, rgb, op, valid, ids,
                                                TILES_X, 16, 16, bg,
                                                interpret=True)
        np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pal_T), np.asarray(ref_T),
                                   atol=1e-5)

    def test_gradient_parity(self, inputs):
        xy, conic, rgb, op, valid, ids = inputs
        bg = jnp.array([0.2, 0.4, 0.6])
        rng = np.random.RandomState(7)
        wimg = jnp.asarray(rng.rand(TILES_X * TILES_Y, 3, 256).astype(np.float32))
        wt = jnp.asarray(rng.rand(TILES_X * TILES_Y, 256).astype(np.float32))

        def loss(f):
            def inner(xy_, conic_, rgb_, op_, bg_):
                out, tfin = f(xy_, conic_, rgb_, op_, valid, ids,
                              TILES_X, 16, 16, bg_)
                return (out * wimg).sum() + (tfin * wt).sum()
            return inner

        g_ref = jax.grad(loss(composite_tiles_jnp), argnums=(0, 1, 2, 3, 4))(
            xy, conic, rgb, op, bg)
        pal = lambda *a, **kw: composite_tiles_pallas(*a, interpret=True, **kw)
        g_pal = jax.grad(loss(pal), argnums=(0, 1, 2, 3, 4))(
            xy, conic, rgb, op, bg)
        for name, a, b in zip(("xy", "conic", "rgb", "op", "bg"), g_ref, g_pal):
            scale = max(float(jnp.abs(a).max()), 1.0)
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale,
                                       atol=1e-5, err_msg=name)

    def test_early_termination_path(self):
        # near-opaque gaussians saturate T quickly → exercises the done logic
        xy, conic, rgb, op, valid, ids = make_tile_inputs(n=120, seed=5,
                                                          opacity_hi=0.999)
        op = jnp.minimum(op * 3.0, 0.995)
        bg = jnp.zeros(3)
        ref_out, ref_T = composite_tiles_jnp(xy, conic, rgb, op, valid, ids,
                                             TILES_X, 16, 16, bg)
        pal_out, pal_T = composite_tiles_pallas(xy, conic, rgb, op, valid, ids,
                                                TILES_X, 16, 16, bg,
                                                interpret=True)
        assert float(ref_T.min()) < 1e-3  # termination actually hit
        np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                                   atol=1e-5)

    def test_empty_tiles(self):
        xy, conic, rgb, op, valid, ids = make_tile_inputs(n=4, seed=11)
        bg = jnp.array([1.0, 0.5, 0.25])
        pal_out, pal_T = composite_tiles_pallas(xy, conic, rgb, op, valid, ids,
                                                TILES_X, 16, 16, bg,
                                                interpret=True)
        counts = np.asarray(valid.sum(axis=1))
        empty = np.nonzero(counts == 0)[0]
        assert len(empty) > 0
        for t in empty:
            expected = np.broadcast_to(np.asarray(bg)[:, None], (3, 256))
            np.testing.assert_allclose(np.asarray(pal_out[t]), expected,
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(pal_T[t]), 1.0, atol=1e-6)
