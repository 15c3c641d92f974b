"""Fast-math compositing mode (RasterConfig.fast_math).

On CPU/interpret the MXU matmul is exact f32, so the fast path differs from
the exact scan only by log/exp round-trip rounding — these tests pin the
mechanics (flag plumbing, fwd/bwd agreement, trainability); the bf16 accuracy
trade and the speedup are measured on hardware (BASELINE.md / exp_perf.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.pallas.composite import (
    _cumprod_lanes, _cumprod_lanes_fast, _cumsum_lanes, _cumsum_lanes_fast)
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      _rasterize_stream)
from mvs_gaussian_splatting_tpu.utils import graphics

W, H = 64, 48
TILES_X, TILES_Y = W // 16, H // 16


def test_fast_scan_helpers_close_to_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0.01, 1.0, (8, 128)).astype(np.float32))
    incl, excl = _cumprod_lanes(x)
    fincl, fexcl = _cumprod_lanes_fast(x)
    np.testing.assert_allclose(np.asarray(fincl), np.asarray(incl),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fexcl), np.asarray(excl),
                               rtol=5e-4, atol=1e-6)
    y = jnp.asarray(rng.randn(8, 128).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_cumsum_lanes_fast(y, strict=False)),
                               np.asarray(_cumsum_lanes(y, strict=False)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(_cumsum_lanes_fast(y, strict=True)),
                               np.asarray(_cumsum_lanes(y, strict=True)),
                               rtol=1e-4, atol=1e-4)


def _scene(n=150, seed=3):
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


def _render(cam, args, bg, fast):
    means, scales, quats, opac, colors = args
    p = preprocess(means, opac, cam, W, H, scales=scales, rotations=quats,
                   colors_precomp=colors)
    cfg = RasterConfig(instance_cap=1 << 14, fast_math=fast)
    return _rasterize_stream(p, W, H, bg, cfg, TILES_X, TILES_Y,
                             interpret=True)


def test_fast_stream_image_close_to_exact():
    cam, args = _scene()
    bg = jnp.asarray([0.1, 0.2, 0.3])
    img_e, aux_e = _render(cam, args, bg, fast=False)
    img_f, aux_f = _render(cam, args, bg, fast=True)
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_e),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(aux_f["final_T"]),
                               np.asarray(aux_e["final_T"]), atol=2e-3)


def test_fast_stream_grads_close_to_exact():
    cam, args = _scene()
    bg = jnp.zeros(3)

    def loss(means, opac, fast):
        a = (means, args[1], args[2], opac, args[4])
        img, _ = _render(cam, a, bg, fast)
        return (img * jnp.sin(jnp.arange(img.size).reshape(img.shape))).sum()

    ge = jax.grad(loss, argnums=(0, 1))(args[0], args[3], False)
    gf = jax.grad(loss, argnums=(0, 1))(args[0], args[3], True)
    for e, f in zip(ge, gf):
        e, f = np.asarray(e), np.asarray(f)
        denom = np.abs(e).max() + 1e-8
        assert np.abs(f - e).max() / denom < 5e-3
        assert np.isfinite(f).all()
