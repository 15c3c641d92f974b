"""Gaussian-sharded (primitive-sharded) stream rendering vs single-device:
image parity and gradient reassembly through dynamic-slice → all_to_all →
merge-sort-gather → custom-VJP kernel, on the 8-device CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      _rasterize_stream)
from mvs_gaussian_splatting_tpu.parallel.gauss_stream import (
    make_gauss_sharded_stream)
from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
from mvs_gaussian_splatting_tpu.utils import graphics
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H = 128, 80


def _camera():
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P_ = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    return CameraView(jnp.eye(4), jnp.asarray(P_), jnp.zeros(3),
                      jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovy / 2)))


def _inputs(n=152, seed=0):
    assert n % 8 == 0
    rng = np.random.RandomState(seed)
    z = rng.uniform(2, 6, n)
    means = np.stack([rng.uniform(-0.8, 0.8, n) * z,
                      rng.uniform(-0.6, 0.6, n) * z, z], -1).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(cols))


def _pre(means, scales, quats, opac, cols):
    return preprocess(means, opac, _camera(), W, H, scales=scales,
                      rotations=normalize(quats), colors_precomp=cols)


CFG = RasterConfig(max_tiles_per_gaussian=16, backend="stream")
TILES_X, TILES_Y = -(-W // 16), -(-H // 16)


@pytest.mark.parametrize("round_robin", [True, False])
def test_gauss_sharded_matches_single_device(round_robin):
    args = _inputs(152)
    p = _pre(*args)
    bg = jnp.array([0.2, 0.3, 0.4])
    ref_img, _ = _rasterize_stream(p, W, H, bg, CFG, TILES_X, TILES_Y,
                                   interpret=True)
    mesh = make_mesh(8, axes=("gauss",))
    fn = make_gauss_sharded_stream(mesh, "gauss", W, H, CFG,
                                   round_robin=round_robin, interpret=True)
    with mesh:
        img, aux = fn(p, bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=1e-5, rtol=1e-4)
    assert int(aux["overflow_quota"]) == 0
    assert int(aux["overflow_capacity"]) == 0


def test_gauss_sharded_round_robin_nondivisible_tiles():
    # 7×6 = 42 tiles on 8 devices: t_per = 6, 6 padding positions — the
    # destination-major remap and the assembly inverse must still agree
    # with the single-device image
    w, h = 112, 96
    tx, ty = -(-w // 16), -(-h // 16)
    args = _inputs(152, seed=11)
    p = preprocess(args[0], args[3], _camera(), w, h, scales=args[1],
                   rotations=normalize(args[2]), colors_precomp=args[4])
    bg = jnp.array([0.1, 0.2, 0.3])
    ref_img, _ = _rasterize_stream(p, w, h, bg, CFG, tx, ty, interpret=True)
    mesh = make_mesh(8, axes=("gauss",))
    fn = make_gauss_sharded_stream(mesh, "gauss", w, h, CFG,
                                   round_robin=True, interpret=True)
    with mesh:
        img, _ = fn(p, bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("round_robin", [True, False])
def test_gauss_sharded_gradients_match(round_robin):
    args = _inputs(104, seed=7)
    bg = jnp.zeros(3)
    cot = jnp.asarray(
        np.random.RandomState(1).rand(3, H, W).astype(np.float32))

    def loss_single(*a):
        img, _ = _rasterize_stream(_pre(*a), W, H, bg, CFG, TILES_X, TILES_Y,
                                   interpret=True)
        return (img * cot).sum()

    mesh = make_mesh(8, axes=("gauss",))
    fn = make_gauss_sharded_stream(mesh, "gauss", W, H, CFG,
                                   round_robin=round_robin, interpret=True)

    def loss_sharded(*a):
        with mesh:
            img, _ = fn(_pre(*a), bg)
        return (img * cot).sum()

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    g_sh = jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_sh,
                          ("means", "scales", "quats", "opac", "cols")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-3, err_msg=name)


def test_quota_overflow_is_counted():
    # a dense scene against the minimum quota (CHUNK) forces strip
    # truncation; the counter must see it
    args = _inputs(1600, seed=3)
    p = _pre(*args)
    mesh = make_mesh(8, axes=("gauss",))
    fn = make_gauss_sharded_stream(mesh, "gauss", W, H, CFG, quota=128,
                                   interpret=True)
    with mesh:
        img, aux = fn(p, jnp.zeros(3))
    assert np.isfinite(np.asarray(img)).all()
    assert int(aux["overflow_quota"]) > 0
