"""Tile-sharded STREAM composite vs single-device stream on the 8-device CPU
mesh: image parity and exact gradient reassembly through the shard_map
transpose's psum of the masked per-instance gradient streams."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mvs_gaussian_splatting_tpu.ops import CameraView, preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      _rasterize_stream,
                                                      rasterize)
from mvs_gaussian_splatting_tpu.parallel.mesh import make_mesh
from mvs_gaussian_splatting_tpu.parallel.tile_stream import (
    make_tile_sharded_stream)
from mvs_gaussian_splatting_tpu.utils import graphics
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H = 128, 80   # 8×5 = 40 tiles over 8 devices (padded to 48)


def _camera():
    fovx = math.radians(60.0)
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
    P_ = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    return CameraView(jnp.eye(4), jnp.asarray(P_), jnp.zeros(3),
                      jnp.float32(math.tan(fovx / 2)),
                      jnp.float32(math.tan(fovy / 2)))


def _inputs(n=150, seed=0):
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


def test_tile_sharded_stream_matches_single_device():
    args = _inputs()
    p = _pre(*args)
    bg = jnp.array([0.2, 0.3, 0.4])

    tiles_x, tiles_y = -(-W // 16), -(-H // 16)
    from mvs_gaussian_splatting_tpu.ops.rasterize import _rasterize_stream
    ref_img, ref_aux = _rasterize_stream(p, W, H, bg, CFG, tiles_x, tiles_y,
                                         interpret=True)

    mesh = make_mesh(8, axes=("tile",))
    fn = make_tile_sharded_stream(mesh, "tile", W, H, CFG, interpret=True)
    with mesh:
        img, aux = fn(p, bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=1e-5, rtol=1e-4)
    assert int(aux["overflow_capacity"]) == 0


def test_tile_sharded_stream_gradients_exact():
    args = _inputs(100, 7)
    bg = jnp.zeros(3)
    cot = jnp.asarray(
        np.random.RandomState(1).rand(3, H, W).astype(np.float32))

    tiles_x, tiles_y = -(-W // 16), -(-H // 16)
    from mvs_gaussian_splatting_tpu.ops.rasterize import _rasterize_stream

    def loss_single(*a):
        img, _ = _rasterize_stream(_pre(*a), W, H, bg, CFG, tiles_x, tiles_y,
                                   interpret=True)
        return jnp.vdot(img, cot)

    mesh = make_mesh(8, axes=("tile",))
    fn = make_tile_sharded_stream(mesh, "tile", W, H, CFG, interpret=True)

    def loss_sharded(*a):
        img, _ = fn(_pre(*a), bg)
        return jnp.vdot(img, cot)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    with mesh:
        g_shd = jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4))(*args)

    for gr, gs, name in zip(g_ref, g_shd,
                            ["means", "scales", "quats", "opac", "cols"]):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_round_robin_matches_single_device():
    """Stride-D tile assignment (load balance) must be output-invariant and
    exercise the exact per-segment gradient mask."""
    args = _inputs(150, seed=2)
    p = _pre(*args)
    bg = jnp.array([0.1, 0.2, 0.3])
    ref_img, _ = _rasterize_stream(p, W, H, bg, CFG, tiles_x=-(-W // 16),
                                   tiles_y=-(-H // 16), interpret=True)
    mesh = make_mesh(8, axes=("tile",))
    fn = make_tile_sharded_stream(mesh, "tile", W, H, CFG, interpret=True,
                                  round_robin=True)
    with mesh:
        img, aux = fn(p, bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=1e-5, rtol=1e-4)


def test_round_robin_gradients_exact():
    args = _inputs(100, seed=9)
    bg = jnp.zeros(3)
    cot = jnp.asarray(
        np.random.RandomState(4).rand(3, H, W).astype(np.float32))
    tiles_x, tiles_y = -(-W // 16), -(-H // 16)

    def loss_single(*a):
        img, _ = _rasterize_stream(_pre(*a), W, H, bg, CFG, tiles_x, tiles_y,
                                   interpret=True)
        return (img * cot).sum()

    mesh = make_mesh(8, axes=("tile",))
    fn = make_tile_sharded_stream(mesh, "tile", W, H, CFG, interpret=True,
                                  round_robin=True)

    def loss_rr(*a):
        with mesh:
            img, _ = fn(_pre(*a), bg)
        return (img * cot).sum()

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    g_rr = jax.grad(loss_rr, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_rr,
                          ("means", "scales", "quats", "opac", "cols")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-3, err_msg=name)
